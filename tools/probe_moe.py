"""On-chip MoE validation + throughput: uit_xs_moe forward on the real
TPU — finiteness, CPU-vs-TPU agreement on a small batch, and clips/s at
serving batch sizes (single chip; expert-PARALLEL execution needs a
multi-chip mesh and is pinned on the 8-device CPU mesh instead,
tests/test_moe.py).

Run:  timeout 900 python tools/probe_moe.py [B] [n_experts]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    log(f"# device {jax.devices()[0]} B={B} E={E}")

    cfg = models.get_model_config("uit_xs_moe", outputdim=537,
                                  target_length=102, n_experts=E)
    params, state = models.build(cfg, jax.random.key(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    log(f"# uit_xs_moe params: {n_params/1e6:.2f}M (dense uit_xs ~1.5M)")

    fwd = jax.jit(lambda w: models.apply(cfg, params, state, w))

    # numerics: small-batch TPU vs CPU
    rng = np.random.default_rng(0)
    small = rng.standard_normal((8, 16000)).astype(np.float32) * 0.1
    got = np.asarray(fwd(jnp.asarray(small)))
    cpu_fwd = jax.jit(lambda w: models.apply(cfg, params, state, w),
                      backend="cpu")
    want = np.asarray(cpu_fwd(small))
    drift = float(np.abs(got - want).max())
    print(f"tpu-vs-cpu drift (B=8): {drift:.2e}", flush=True)
    assert np.isfinite(got).all()

    # throughput at serving batch
    t0 = time.perf_counter()
    wavs = [jnp.asarray(rng.standard_normal((B, 16000)).astype(np.float32)
                        * 0.1) for _ in range(2)]
    jax.block_until_ready(wavs)
    log(f"# uploaded 2x({B},16000) f32 in {time.perf_counter() - t0:.1f}s")
    out = None
    for w in wavs:
        out = fwd(w)
    out.block_until_ready()
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(8):
            out = fwd(wavs[i % 2])
        out.block_until_ready()
        best = max(best, 8 * B / (time.perf_counter() - t0))
    print(f"uit_xs_moe E={E} B={B}: {best:,.0f} clips/s", flush=True)


if __name__ == "__main__":
    main()
