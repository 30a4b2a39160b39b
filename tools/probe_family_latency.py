"""Per-family single-clip device latency — the reference's own headline
table, column for column (README.md:18-24: uit_xs 3.4 ms, uit_2xs
1.7 ms, uit_3xs 1.2 ms, MobileNetV2 8.0 ms on a Snapdragon 865).

Round-5 session results (v5e, fast int16 forward, profiler device p50
per blocking dispatch, after the slices-framing fix):

    uit_xs      0.051 ms vs 3.4 ms  (67x)
    uit_xxs     0.031 ms vs 1.7 ms  (55x)
    uit_xxxs    0.024 ms vs 1.2 ms  (50x)
    MobileNetV2 0.029 ms vs 8.0 ms  (273x)

Run:  timeout 3000 python tools/probe_family_latency.py
"""

import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (family, reference ms on its best mobile chip, README.md:18-24)
FAMILIES = [("uit_xs", 3.4), ("uit_xxs", 1.7), ("uit_xxxs", 1.2),
            ("MobileNetV2", 8.0)]


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    assert dev.platform == "tpu", "latency probe needs the real chip"
    print(f"# device {dev}", flush=True)

    rng = np.random.default_rng(0)
    base = rng.integers(-8000, 8000, size=(2, 16000), dtype=np.int16)
    bufs = [jnp.asarray(base[:1]), jnp.asarray(base[1:2])]

    def p50(name, fn, iters=20):
        fn(bufs[0]).block_until_ready()
        fn(bufs[1]).block_until_ready()
        d = f"/tmp/uit_famlat_{name}"
        shutil.rmtree(d, ignore_errors=True)
        jax.profiler.start_trace(d)
        for i in range(iters):
            fn(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(d), reverse=True)[:iters]
        return float(np.percentile(durs, 50)) if durs else float("nan")

    print(f"\n{'family':<12} {'dev p50 ms':>11} {'ref ms':>7} {'x':>6}",
          flush=True)
    for fam, ref_ms in FAMILIES:
        kw = {"mel_layout": "tfb"} if fam.startswith("uit") else {}
        cfg = models.get_model_config(
            fam, outputdim=537 if fam.startswith("uit") else 527,
            **({"target_length": 102} if fam.startswith("uit") else {}),
            **kw)
        params, state = models.build(cfg, jax.random.key(0))
        fwd = jax.jit(make_forward_fn(cfg, params, state, use_pallas=True,
                                      precision="fast"))
        ms = p50(fam, fwd)
        print(f"{fam:<12} {ms:>11.3f} {ref_ms:>7.1f} {ref_ms / ms:>6.1f}",
              flush=True)


if __name__ == "__main__":
    main()
