"""Serving-ceiling roofline (round-4 VERDICT next-3): is the measured
~6.05 ms/batch device limit at B=2048 genuinely bandwidth/latency-bound,
or is the "speed of light" claim hiding headroom?

Method: the production serving program (fast tfb, int16, B=2048) plus
stage subprograms (mel frontend only; encoder+head only), each measured
two ways —
  * DEVICE time: profiler busy-time per blocking dispatch
  * HBM bytes:  XLA's fusion-aware 'bytes accessed' cost analysis
    (Pallas kernels contribute their declared CostEstimate), next to the
    analytic per-stage hand model (utils.flops.uit_serve_stage_bytes)
— then utilization on BOTH axes: MFU vs 197 TF/s bf16 peak and HBM util
vs 819 GB/s. A stage near the HBM roofline is certified; a stage far
from both rooflines names the next lever (or is VPU/latency-bound,
which neither axis measures — say so rather than guess).

Run:  timeout 3000 python tools/probe_roofline.py
"""

import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 2048


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.flops import (
        device_hbm_bandwidth,
        device_peak_flops,
        uit_serve_stage_bytes,
        xla_cost,
    )
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    bw = device_hbm_bandwidth(dev) or 819e9
    peak = device_peak_flops(dev) or 197e12
    print(f"# device {dev}  HBM {bw / 1e9:.0f} GB/s  peak {peak / 1e12:.0f} TF/s",
          flush=True)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  mel_layout="tfb")
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    pcm = [jnp.asarray(rng.integers(-8000, 8000, size=(B, 16000),
                                    dtype=np.int16)) for _ in range(2)]

    fwd_full = jax.jit(make_forward_fn(cfg, params, state, use_pallas=on_tpu,
                                       precision="fast"))
    fe = make_frontend_fn(cfg.frontend, use_pallas=on_tpu, precision="fast",
                          layout="tfb")
    fwd_mel = jax.jit(fe)
    # encoder+head from a device-resident mel (the non-frontend remainder)
    from uit_mobile_tpu.models import uit as uit_mod

    def enc(mel):
        feats = uit_mod._finish_features(
            cfg, params, uit_mod.patch_embed_tfb(cfg, params, state, mel))
        return uit_mod.forward_head(cfg, params, feats)

    fwd_enc = jax.jit(enc)
    mel0 = jax.block_until_ready(fwd_mel(pcm[0]))
    mel1 = jax.block_until_ready(fwd_mel(pcm[1]))
    mels = [mel0, mel1]

    def device_ms(name, fn, bufs, iters=8):
        fn(bufs[0]).block_until_ready()
        fn(bufs[1]).block_until_ready()
        logdir = f"/tmp/uit_roofline_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(iters):
            fn(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:iters]
        return float(np.median(durs)) if durs else float("nan")

    rows = []
    for name, fn, bufs in (("full", fwd_full, pcm),
                           ("mel_frontend", fwd_mel, pcm),
                           ("encoder_head", fwd_enc, mels)):
        cost = xla_cost(fn, bufs[0])
        ms = device_ms(name, fn, bufs) if on_tpu else float("nan")
        rows.append((name, ms, cost["bytes"], cost["flops"]))

    print(f"\n{'stage':<14} {'dev ms':>8} {'GB':>7} {'GFLOP':>8} "
          f"{'hbm_util':>9} {'mfu':>6}", flush=True)
    for name, ms, by, fl in rows:
        hu = (by / (ms * 1e-3)) / bw if by and ms == ms else None
        mf = (fl / (ms * 1e-3)) / peak if fl and ms == ms else None
        print(f"{name:<14} {ms:>8.3f} {by / 1e9 if by else 0:>7.3f} "
              f"{fl / 1e9 if fl else 0:>8.1f} "
              f"{hu if hu is None else round(hu, 3)!s:>9} "
              f"{mf if mf is None else round(mf, 3)!s:>6}", flush=True)

    # analytic per-stage hand model next to XLA's total
    stages = uit_serve_stage_bytes(cfg, B, 16000, dtype="int16")
    print("\nanalytic per-stage bytes (hand model, per batch):", flush=True)
    for k, v in stages.items():
        t_ms = v / bw * 1e3
        print(f"  {k:<22} {v / 1e9:>7.3f} GB  ({t_ms:>6.3f} ms at HBM BW)",
              flush=True)
    full = rows[0]
    if on_tpu and full[2]:
        print(f"\nfull-program roofline: device {full[1]:.3f} ms/batch; "
              f"XLA bytes => {full[2] / bw * 1e3:.3f} ms at HBM speed of "
              f"light ({full[2] / (full[1] * 1e-3) / bw:.1%} of BW); "
              f"hand model => {stages['total'] / bw * 1e3:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
