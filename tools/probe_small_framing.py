"""Small-batch framing latency: is the XLA gather the right framing for
B<=16, or only for throughput shapes?

After the B=1 pad-to-2 guard (PERF_NOTES round 5) the single-clip
forward is 0.162 ms, of which the mel program is ~0.113 — and the op
table shows one ~84 us fusion (the framing gather + surrounds) that is
nearly CONSTANT in batch size (0.34 ms at B=2048: only 4x the cost for
1024x the data), i.e. at tiny batches it is pure lowering latency, not
bandwidth. At B=2048 the alternatives measured WORSE (flat-index +29%,
chunk-slice+concat +17%, PERF_NOTES round 2) — but those were
throughput verdicts. This probe re-measures the candidates at the
latency shapes (B in 1, 2, 8, 16): mel-only device p50 via

  gather      wav[:, idx]            (the shipped framing)
  slices      stack of 104 static hop-strided slices

Both are pure indexing — bitwise-identical frames — so a win can ship
as a batch-gated route with no numerics cost.

Run:  timeout 3000 python tools/probe_small_framing.py
"""

import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu.frontend.mel import FrontendConfig
    from uit_mobile_tpu.ops.pallas_mel import pallas_log_mel
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    assert dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    cfg = FrontendConfig()
    n_fft, hop = cfg.n_fft, cfg.hop_length

    def frames_gather(wav):
        pad = n_fft // 2
        w = jnp.concatenate([wav[:, 1:pad + 1][:, ::-1], wav,
                             wav[:, -pad - 1:-1][:, ::-1]], axis=-1)
        Tp = w.shape[-1]
        n_frames = (Tp - n_fft) // hop + 1
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        return w[:, np.minimum(idx, Tp - 1)]

    def frames_slices(wav):
        pad = n_fft // 2
        w = jnp.concatenate([wav[:, 1:pad + 1][:, ::-1], wav,
                             wav[:, -pad - 1:-1][:, ::-1]], axis=-1)
        Tp = w.shape[-1]
        n_frames = (Tp - n_fft) // hop + 1
        return jnp.stack([w[:, i * hop:i * hop + n_fft]
                          for i in range(n_frames)], axis=1)

    rng = np.random.default_rng(0)
    base = rng.integers(-8000, 8000, size=(32, 16000), dtype=np.int16)

    def p50(name, fn, bufs, iters=20):
        fn(bufs[0]).block_until_ready()
        fn(bufs[1]).block_until_ready()
        logdir = f"/tmp/uit_framing_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(iters):
            fn(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:iters]
        return float(np.percentile(durs, 50)) if durs else float("nan")

    variants = [("gather", frames_gather), ("slices", frames_slices)]
    # equivalence first (CPU-verifiable semantics, run on chip)
    w = jnp.asarray(base[:2])
    ref = np.asarray(frames_gather(w))
    for name, fn in variants[1:]:
        try:
            got = np.asarray(fn(w))
            print(f"# {name}: max |frames diff| = "
                  f"{np.abs(got - ref).max()}", flush=True)
        except ValueError as e:
            print(f"# {name}: skipped ({e})", flush=True)

    print(f"\n{'B':>4} " + " ".join(f"{n:>10}" for n, _ in variants) +
          f" {'mel-full':>10}", flush=True)
    for B in (1, 2, 8, 16):
        row = []
        for name, fn in variants:
            f = jax.jit(fn)
            bufs = [jnp.asarray(base[:B]), jnp.asarray(base[B:2 * B])]
            row.append(p50(f"{name}{B}", f, bufs))
        mel = jax.jit(lambda x: pallas_log_mel(x, cfg, precision="fast",
                                               layout="tfb"))
        bufs = [jnp.asarray(base[:B]), jnp.asarray(base[B:2 * B])]
        mel_ms = p50(f"mel{B}", mel, bufs)
        print(f"{B:>4} " + " ".join(f"{v * 1e3:>9.1f}u" for v in row) +
              f" {mel_ms * 1e3:>9.1f}u", flush=True)


if __name__ == "__main__":
    main()
