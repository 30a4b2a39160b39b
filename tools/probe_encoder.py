"""Same-process A/B: XLA encoder vs the whole-encoder Pallas kernel (v2).

Both paths: Pallas fast-tfb mel + BN-folded patch embed + int16 PCM.
The kernel keeps all 12 blocks' activations in VMEM (grid carries x per
batch block across the layer axis) — see ops/pallas_encoder_tfb.py.

Run on the real chip:  timeout 600 python tools/probe_encoder.py [B]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure(fn, bufs, clips, rounds=4, depth=8):
    out = None
    for b in bufs:
        out = fn(b)
    out.block_until_ready()
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        for i in range(depth):
            out = fn(bufs[i % len(bufs)])
        out.block_until_ready()
        best = max(best, depth * clips / (time.perf_counter() - t0))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.frontend import quantize_pcm16
    from uit_mobile_tpu.ops.pipeline import (
        make_forward_fn, make_fused_encoder_forward, make_scanned_forward,
    )
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    log(f"# device {jax.devices()[0]} B={B}")
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    wavs = [jnp.asarray(quantize_pcm16(
        rng.standard_normal((B, 16000)).astype(np.float32) * 0.1))
        for _ in range(2)]
    jax.block_until_ready(wavs)
    log("# uploaded")

    base_fn = make_forward_fn(cfg, params, state, use_pallas=True,
                              precision="fast")
    base = jax.jit(base_fn)
    v0 = measure(base, wavs, B)
    print(f"XLA encoder:   {v0:,.0f} clips/s", flush=True)

    variants = [("hybrid", dict(mode="hybrid")),
                ("full b_blk=128", dict(mode="full", block_b=128))]
    if "--hybrid-only" in sys.argv:
        variants = variants[:1]
    for name, kw in variants:
        fe_fn = make_fused_encoder_forward(cfg, params, state, **kw)
        fe = jax.jit(fe_fn)
        try:
            v = measure(fe, wavs, B)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        d = float(jnp.max(jnp.abs(fe(wavs[0]) - base(wavs[0]))))
        print(f"{name}: {v:,.0f} clips/s ({v / v0 - 1:+.1%}); "
              f"max |probs diff| {d:.2e}", flush=True)

    # with scanned dispatch on top (the real serving configuration)
    K = 8
    @jax.jit
    def mkblock(a, b, s):
        return jnp.stack([jnp.roll(a if i % 2 == 0 else b, s + i, axis=0)
                          for i in range(K)])

    blocks = [jax.block_until_ready(mkblock(wavs[0], wavs[1], j * K))
              for j in range(2)]
    for name, fn in (("xla", base_fn),
                     ("hybrid", make_fused_encoder_forward(
                         cfg, params, state, mode="hybrid"))):
        try:
            sc = jax.jit(make_scanned_forward(fn))
            v = measure(sc, blocks, K * B, depth=2)
            print(f"scan K={K} {name}: {v:,.0f} clips/s", flush=True)
        except Exception as e:
            print(f"scan {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
