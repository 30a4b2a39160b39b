"""In-program framing crossover: where does the slices framing stop
winning? (The evidence behind `pallas_log_mel(framing='auto')`.)

tools/probe_small_framing.py measures the framing ops STANDALONE (slices
win everywhere); this probe measures what actually matters — the full
serving forward with each framing — plus the bitwise check and the
B=1-without-pad-guard question. Round-5 session results (v5e, device
p50 per blocking dispatch):

    full fwd   B=1     B=64    B=256   B=1024   B=2048
    slices     50.6us  261.5   637.4   3019.7   6088.7
    gather     161.8*  344.2   799.0   3011.5   6051.2
    (*with the pad-to-2 guard; unguarded gather B=1 was 474 us)

=> slices below B=1024, gather at/above — the 'auto' rule. Bitwise 0.0
across layouts x precisions; the B=1 slices route needs no pad guard
(13.3 us mel with or without).

Run:  timeout 3000 python tools/probe_framing_crossover.py
"""

import functools
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    import uit_mobile_tpu.ops.pallas_mel as pm
    from uit_mobile_tpu.frontend.mel import FrontendConfig
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    assert dev.platform == "tpu", "crossover probe needs the real chip"
    print(f"# device {dev}", flush=True)

    cfg = FrontendConfig()
    rng = np.random.default_rng(0)
    base = rng.integers(-8000, 8000, size=(4096, 16000), dtype=np.int16)

    # bitwise: the framings build identical mels
    for layout, B in (("tfb", 2048), ("btf", 8), ("bft", 256)):
        w = jnp.asarray(base[:B])
        a = np.asarray(pm.pallas_log_mel(w, cfg, precision="fast",
                                         layout=layout, framing="slices"))
        b = np.asarray(pm.pallas_log_mel(w, cfg, precision="fast",
                                         layout=layout, framing="gather"))
        print(f"bitwise {layout} B={B}: {np.abs(a - b).max()}", flush=True)

    def p50(name, fn, bufs, iters=12):
        fn(bufs[0]).block_until_ready()
        fn(bufs[1]).block_until_ready()
        d = f"/tmp/uit_fcross_{name}"
        shutil.rmtree(d, ignore_errors=True)
        jax.profiler.start_trace(d)
        for i in range(iters):
            fn(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(d), reverse=True)[:iters]
        return float(np.percentile(durs, 50)) if durs else float("nan")

    mcfg = models.get_model_config("uit_xs", outputdim=537,
                                   target_length=102, mel_layout="tfb")
    params, state = models.build(mcfg, jax.random.key(0))
    orig = pm.pallas_log_mel
    print(f"\n{'B':>6} {'slices us':>10} {'gather us':>10}", flush=True)
    try:
        for B in (1, 64, 256, 1024, 2048):
            row = []
            for fr in ("slices", "gather"):
                pm.pallas_log_mel = functools.partial(orig, framing=fr)
                fwd = jax.jit(make_forward_fn(mcfg, params, state,
                                              use_pallas=True,
                                              precision="fast"))
                bufs = [jnp.asarray(base[:B]), jnp.asarray(base[B:2 * B])]
                row.append(p50(f"{fr}{B}", fwd, bufs))
            print(f"{B:>6} {row[0] * 1e3:>10.1f} {row[1] * 1e3:>10.1f}",
                  flush=True)
    finally:
        pm.pallas_log_mel = orig


if __name__ == "__main__":
    main()
