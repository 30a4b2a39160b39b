"""Same-process A/B: scanned dispatch at K=64 with lax.scan unroll 1/2/4.

The round-3 scanned path reaches ~95% of device-limited throughput; the
residual was attributed to scan step scheduling. Unrolling the scan body
lets XLA schedule across batch boundaries — this probe measures whether
that recovers any of it (cost: compile time scales with the unroll
factor).

Run on the real chip:  timeout 1800 python tools/probe_scan_unroll.py [B] [K]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(fn, bufs, total_clips, rounds=4, depth=4):
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
    from uit_mobile_tpu.ops.pipeline import make_block_builder
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
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
    mkblock = make_block_builder(K)
    blocks = [jax.block_until_ready(mkblock(wavs[0], wavs[1], j * K))
              for j in range(2)]
    log("# blocks built on device")

    for unroll in (1, 2, 4):
        scanned = jax.jit(make_scanned_forward(fwd, unroll=unroll))
        t0 = time.perf_counter()
        v = measure(scanned, blocks, K * B)
        log(f"# unroll={unroll} measured in {time.perf_counter() - t0:.0f}s")
        print(f"B={B} K={K} unroll={unroll}: {v:,.0f} clips/s", flush=True)


if __name__ == "__main__":
    main()
