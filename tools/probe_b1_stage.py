"""Localize the B=1 pathology: which stage owns the 426 us fusion?

probe_b1_optable found the B=1 serving forward spends 425.9 of 473 us
in ONE XLA fusion (B=2: 83.6 us). This probe times the mel frontend and
the encoder+head separately at B=1 and B=2 to name the stage, then
at B=1 with the wav padded to B=2 inside the program to test the cheap
fix (row-kernel mel rows are per-frame independent, so row 0 is
unaffected by a pad row).

Run:  timeout 3000 python tools/probe_b1_stage.py
"""

import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LOGDIR = "/tmp/uit_b1_stage"


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.models import uit as uit_mod
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    assert dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  mel_layout="tfb")
    params, state = models.build(cfg, jax.random.key(0))
    fe = make_frontend_fn(cfg.frontend, use_pallas=True, precision="fast",
                          layout="tfb")
    fwd_mel = jax.jit(fe)

    def enc(mel):
        feats = uit_mod._finish_features(
            cfg, params, uit_mod.patch_embed_tfb(cfg, params, state, mel))
        return uit_mod.forward_head(cfg, params, feats)

    fwd_enc = jax.jit(enc)
    fwd_full = jax.jit(make_forward_fn(cfg, params, state, use_pallas=True,
                                       precision="fast"))

    @jax.jit
    def fwd_pad2(wav):  # B=1 padded to 2 inside the program, row 0 out
        padded = jnp.concatenate([wav, jnp.zeros_like(wav)], axis=0)
        return fwd_full(padded)[:1]

    rng = np.random.default_rng(0)
    base = rng.integers(-8000, 8000, size=(4, 16000), dtype=np.int16)

    def p50(name, fn, bufs, iters=20):
        fn(bufs[0]).block_until_ready()
        fn(bufs[1]).block_until_ready()
        logdir = f"{LOGDIR}_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(iters):
            fn(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:iters]
        return float(np.percentile(durs, 50)) if durs else float("nan")

    for B in (1, 2):
        bufs = [jnp.asarray(base[:B]), jnp.asarray(base[B:2 * B])]
        mels = [jax.block_until_ready(fwd_mel(b)) for b in bufs]
        ms_mel = p50(f"mel{B}", fwd_mel, bufs)
        ms_enc = p50(f"enc{B}", fwd_enc, mels)
        ms_full = p50(f"full{B}", fwd_full, bufs)
        print(f"B={B}: mel {ms_mel:.3f}  enc+head {ms_enc:.3f}  "
              f"full {ms_full:.3f} ms", flush=True)

    b1 = [jnp.asarray(base[:1]), jnp.asarray(base[1:2])]
    ms_pad = p50("pad2", fwd_pad2, b1)
    drift = float(jnp.max(jnp.abs(fwd_pad2(b1[0]) - fwd_full(b1[0]))))
    print(f"B=1 padded-to-2 in-program: {ms_pad:.3f} ms "
          f"(drift vs B=1 program {drift:.2e})", flush=True)


if __name__ == "__main__":
    main()
