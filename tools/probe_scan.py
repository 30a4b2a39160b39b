"""Same-process A/B: per-batch dispatch vs K-batch scanned dispatch.

Measures the round-2 VERDICT's #1 item — wall 210k clips/s vs ~332k
device-limited was attributed to per-dispatch overhead; a lax.scan over a
device-resident (K, B, T) block pays that cost once per K batches.

Run on the real chip:  timeout 600 python tools/probe_scan.py
"""

import sys
import time

import numpy as np


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
    print(f"# device {jax.devices()[0]}", file=sys.stderr)
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    fwd = make_forward_fn(cfg, params, state, use_pallas=True,
                          precision="fast")
    rng = np.random.default_rng(0)

    for B in (2048, 4096):
        pcm = [quantize_pcm16(
            rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
            for _ in range(2)]
        wavs = [jnp.asarray(p) for p in pcm]
        per_batch = jax.jit(fwd)
        base = measure(per_batch, wavs, B)
        print(f"B={B} per-batch: {base:,.0f} clips/s")
        for K in (4, 8, 16):
            if K * B * 16000 * 2 > 3e9:
                continue
            blocks = [jnp.asarray(np.stack([
                quantize_pcm16(rng.standard_normal((B, 16000))
                               .astype(np.float32) * 0.1)
                for _ in range(K)])) for _ in range(2)]
            scanned = jax.jit(make_scanned_forward(fwd))
            v = measure(scanned, blocks, K * B, depth=max(2, 16 // K))
            print(f"B={B} scan K={K}: {v:,.0f} clips/s "
                  f"({v / base - 1:+.1%} vs per-batch)")
            del blocks


if __name__ == "__main__":
    main()
