"""int16 wav blocks through the FULL frontier train step — A/B vs f32.

Serving's headline has shipped raw int16 PCM since round 1: the mel
kernels fold the 1/32768 scale into their DFT matrices (bitwise) and the
framing gather materializes 2-byte frames — the measured frontend win
was 3.61 -> 2.64 ms at B=2048 (ops/pallas_mel.py:164). Training always
up-cast to f32 on device first (_norm), so BOTH mel kernels' gathers ran
at 4-byte traffic and the scanned input blocks were f32 (the K=64 OOM in
PERF_NOTES was two 4.2 GB f32 blocks). train/steps.py now passes int16
through when no wav augment is configured; this probe measures what that
buys at the shipped frontier composition (B=1024, tfb bf16 student, bf16
teacher via tfb_to_bft, flat PSL, mixup + clip + AdamW, scan K=16 —
identical to tools/probe_b_recheck.py except the wav dtype), plus an
int16 K=32 leg since the block memory halves.

The f32 wav is DERIVED from the same int16 arrays on device (exact
*2^-15), so losses must match to float print precision.

Run:  timeout 3000 python tools/probe_int16_train.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 1024


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_multi_step, make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    fe_teacher = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb_to_bft")
    t_params, t_state = models.build(psl_cfg, jax.random.key(1))

    # one set of int16 batches; the f32 legs derive from them on device
    def pcm_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "wav": jnp.asarray(r.integers(-3200, 3200, size=(B, 16000),
                                          dtype=np.int16)),
            "target": jnp.asarray((r.uniform(size=(B, 537)) > 0.95)
                                  .astype(np.float32)),
        }

    base = [pcm_batch(s) for s in range(4)]

    def run(name, K, to_f32):
        cfg = models.get_model_config("uit_xs", outputdim=537,
                                      target_length=102,
                                      compute_dtype="bfloat16",
                                      mel_layout="tfb")
        fe_student = make_frontend_fn(cfg.frontend, use_pallas=on_tpu,
                                      precision="fast", layout="tfb")
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_multi_step(
            make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                            psl_cfg=psl_cfg, psl_split=B // 2,
                            frontend_fn=fe_student,
                            psl_frontend_fn=fe_teacher), psl=True),
            donate_argnums=(0, 1, 2))

        def as_leg(b):
            if not to_f32:
                return b
            return {"wav": b["wav"].astype(jnp.float32) * (1.0 / 32768.0),
                    "target": b["target"]}

        batches = [as_leg(b) for b in base]
        blocks = [jax.block_until_ready(jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[batches[(j + i) % 4] for i in range(K)])) for j in range(2)]
        del batches
        keys = jax.random.split(jax.random.key(7), K)
        t0 = time.perf_counter()
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[0], keys,
                                           t_params, t_state)
        jax.block_until_ready(m)
        print(f"#   compiled {name} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
        loss0 = float(np.asarray(m["total_loss"])[0])
        n_disp = 3
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            params, state, opt_state, m = step(params, state, opt_state,
                                               blocks[i % 2], keys,
                                               t_params, t_state)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * K)
        print(f"{name}: {dt * 1e3:.2f} ms/step = {B / dt:.0f} clips/s "
              f"(loss0 {loss0:.6f})", flush=True)
        return dt

    legs = [("f32   K=16", 16, True), ("int16 K=16", 16, False),
            ("int16 K=32", 32, False)]
    times = {}
    for name, K, to_f32 in legs:
        try:
            times[name] = run(name, K, to_f32)
        except Exception as e:  # OOM is a legitimate verdict
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
    if "f32   K=16" in times and "int16 K=16" in times:
        d = times["f32   K=16"] / times["int16 K=16"] - 1
        print(f"int16 vs f32 at K=16: {d * 100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
