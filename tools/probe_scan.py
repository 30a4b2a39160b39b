"""Same-process A/B: per-batch dispatch vs K-batch scanned dispatch.

Measures the round-2 VERDICT's #1 item — wall 210k clips/s vs ~332k
device-limited was attributed to per-dispatch overhead; a lax.scan over a
device-resident (K, B, T) block pays that cost once per K batches.

The (K, B, T) blocks are materialized ON DEVICE (jitted roll+stack of the
two uploaded batches) — uploading ~1 GB through the relay would dominate
the probe's runtime and measure nothing.

Run on the real chip:  timeout 600 python tools/probe_scan.py [B] [K]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(fn, bufs, total_clips, rounds=4, depth=8):
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
        best = max(best, depth * total_clips / (time.perf_counter() - t0))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.frontend import quantize_pcm16
    from uit_mobile_tpu.ops import make_forward_fn, make_scanned_forward
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    log(f"# device {jax.devices()[0]} B={B} K={K}")
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    fwd = make_forward_fn(cfg, params, state, use_pallas=True,
                          precision="fast")
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    wavs = [jnp.asarray(quantize_pcm16(
        rng.standard_normal((B, 16000)).astype(np.float32) * 0.1))
        for _ in range(2)]
    jax.block_until_ready(wavs)
    log(f"# uploaded 2x({B},16000) int16 in {time.perf_counter() - t0:.1f}s")

    per_batch = jax.jit(fwd)
    base = measure(per_batch, wavs, B)
    print(f"B={B} per-batch: {base:,.0f} clips/s", flush=True)

    # device-side block assembly: K distinct batches per block via rolls
    @jax.jit
    def mkblock(a, b, s):
        return jnp.stack([jnp.roll(a if i % 2 == 0 else b, s + i, axis=0)
                          for i in range(K)])

    t0 = time.perf_counter()
    blocks = [jax.block_until_ready(mkblock(wavs[0], wavs[1], j * K))
              for j in range(2)]
    log(f"# built 2 device blocks (K={K}) in {time.perf_counter() - t0:.1f}s")
    scanned = jax.jit(make_scanned_forward(fwd))
    v = measure(scanned, blocks, K * B, depth=max(2, 16 // K))
    print(f"B={B} scan K={K}: {v:,.0f} clips/s ({v / base - 1:+.1%})",
          flush=True)


if __name__ == "__main__":
    main()
