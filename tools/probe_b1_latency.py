"""Small-batch device-latency sweep: is the B=1 serving latency number
(0.474 ms, stable across rounds) actually the chip's floor, or does the
B=1 program hit a degenerate-shape path that a padded micro-batch
avoids? BENCH_LAST's latency Pareto says B=8 runs 0.168 ms/BATCH —
3x faster than one clip alone — which, if real, means the low_latency
serving preset (bucket batch_size=8, zero wait: every lone request is
padded to 8 slots) already serves single clips at ~0.17 ms device, and
the bench's b1 number understates the shipped path.

Method: one session, the production fast-tfb int16 forward, profiler
device durations per blocking dispatch (the only trustworthy latency
measure through this relay), 20 iters per B, two alternating buffers
(relay dedup). Also: bitwise check that the first row of a padded-to-8
batch equals the B=1 probs (per-sample top_db -> no cross-clip
coupling; the row mel kernel is per-frame independent).

Run:  timeout 3000 python tools/probe_b1_latency.py
"""

import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  mel_layout="tfb")
    params, state = models.build(cfg, jax.random.key(0))
    fwd = jax.jit(make_forward_fn(cfg, params, state, use_pallas=on_tpu,
                                  precision="fast"))

    rng = np.random.default_rng(0)
    base = rng.integers(-8000, 8000, size=(64, 16000), dtype=np.int16)

    def device_p50(bufs, iters=20):
        fwd(bufs[0]).block_until_ready()
        fwd(bufs[1]).block_until_ready()
        logdir = "/tmp/uit_b1_probe"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(iters):
            fwd(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:iters]
        return float(np.percentile(durs, 50)) if durs else float("nan")

    print(f"\n{'B':>4} {'dev p50 ms/batch':>17} {'ms/clip':>9}", flush=True)
    per_b = {}
    for B in (1, 2, 4, 8, 16, 32, 64):
        bufs = [jnp.asarray(base[:B]), jnp.asarray(base[B:2 * B] if B <= 32
                                                   else base[:B][::-1].copy())]
        ms = device_p50(bufs) if on_tpu else float("nan")
        per_b[B] = ms
        print(f"{B:>4} {ms:>17.3f} {ms / B:>9.3f}", flush=True)

    # bitwise: clip 0 padded to an 8-slot bucket == the B=1 program's probs
    one = jnp.asarray(base[:1])
    padded = jnp.concatenate([one, jnp.zeros((7, 16000), jnp.int16)], axis=0)
    p1 = np.asarray(fwd(one))[0]
    p8 = np.asarray(fwd(padded))[0]
    drift = float(np.max(np.abs(p1 - p8)))
    print(f"\n# padded-to-8 row0 vs B=1 probs: max |diff| = {drift:.2e}",
          flush=True)
    if on_tpu and per_b[8] == per_b[8] and per_b[1] == per_b[1]:
        print(f"# B=1 {per_b[1]:.3f} ms vs padded-8 {per_b[8]:.3f} ms "
              f"({per_b[1] / per_b[8]:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
