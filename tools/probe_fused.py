"""Same-process A/B: 2-stage tfb pipeline vs fused mel->token kernel.

Both run per-sample top_db (serving semantics) at fast precision, int16
PCM input. Also reports profiler device time per batch for each.

Run on the real chip:  timeout 600 python tools/probe_fused.py [B]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


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


def device_ms(fn, bufs, iters=6):
    import jax

    with jax.profiler.trace("/tmp/probe_fused_trace"):
        for i in range(iters):
            out = fn(bufs[i % len(bufs)])
        out.block_until_ready()
    # summing device durations is done offline via tools/profile_gaps.py;
    # here wall of a blocking chain is a cheap proxy
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(bufs[i % len(bufs)])
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.frontend import quantize_pcm16
    from uit_mobile_tpu.ops.pipeline import (
        make_forward_fn, make_fused_token_forward, make_scanned_forward,
    )
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    print(f"# device {jax.devices()[0]} B={B}", file=sys.stderr)
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    pcm = [quantize_pcm16(rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
           for _ in range(2)]
    wavs = [jnp.asarray(p) for p in pcm]

    base_fn = make_forward_fn(cfg, params, state, use_pallas=True,
                              precision="fast", top_db_mode="per_sample")
    base = jax.jit(base_fn)
    v_base = measure(base, wavs, B)
    print(f"2-stage tfb per-sample: {v_base:,.0f} clips/s")

    for blk in (128, 256, 512):
        if B % blk:
            continue
        fused_fn = make_fused_token_forward(cfg, params, state, block_b=blk)
        fused = jax.jit(fused_fn)
        try:
            v = measure(fused, wavs, B)
        except Exception as e:
            print(f"fused block_b={blk}: FAILED {type(e).__name__}: {e}")
            continue
        print(f"fused tokens block_b={blk}: {v:,.0f} clips/s "
              f"({v / v_base - 1:+.1%})")
        # correctness spot check on-chip
        d = float(jnp.max(jnp.abs(fused(wavs[0]) - base(wavs[0]))))
        print(f"  max |probs diff| vs 2-stage: {d:.2e}")

    # fused + scanned dispatch (the two round-3 levers together)
    K = 8
    blocks = [jnp.asarray(np.stack([
        quantize_pcm16(rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
        for _ in range(K)])) for _ in range(2)]
    for name, fn in (("2-stage", base_fn),
                     ("fused-256", make_fused_token_forward(
                         cfg, params, state, block_b=256))):
        try:
            scanned = jax.jit(make_scanned_forward(fn))
            v = measure(scanned, blocks, K * B, depth=2)
            print(f"scan K={K} {name}: {v:,.0f} clips/s")
        except Exception as e:
            print(f"scan {name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
