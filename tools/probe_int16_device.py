"""Device-duration A/B for the int16 train-step passthrough.

Wall-clock through the relay flipped orderings across sessions
(tools/probe_int16_train.py: int16 K=16 -0.2%; probe_int16_k
--decisive: +9.8%), so settle it the PERF_NOTES way: jax.profiler
device busy-time of the SINGLE-step frontier program (B=1024, tfb bf16
student, bf16 teacher via tfb_to_bft, flat PSL, mixup + clip + AdamW),
f32 wav vs raw int16 wav, 8 dispatches each, same session.

Run:  timeout 3000 python tools/probe_int16_device.py
"""

import shutil
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
    from uit_mobile_tpu.train.steps import make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    fe_teacher = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb_to_bft")
    t_params, t_state = models.build(psl_cfg, jax.random.key(1))

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  compute_dtype="bfloat16", mel_layout="tfb")
    fe_student = make_frontend_fn(cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb")
    opt = optax.adamw(1e-3)
    step_fn = make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                              psl_cfg=psl_cfg, psl_split=B // 2,
                              frontend_fn=fe_student,
                              psl_frontend_fn=fe_teacher)

    def pcm_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "wav": jnp.asarray(r.integers(-3200, 3200, size=(B, 16000),
                                          dtype=np.int16)),
            "target": jnp.asarray((r.uniform(size=(B, 537)) > 0.95)
                                  .astype(np.float32)),
        }

    base = [pcm_batch(s) for s in range(2)]

    def leg(name, to_f32):
        params, state = models.build(cfg, jax.random.key(0))
        opt_state = opt.init(params)
        # NO donation: params/state reused across profiled dispatches
        step = jax.jit(step_fn)
        batches = base if not to_f32 else [
            {"wav": b["wav"].astype(jnp.float32) * (1.0 / 32768.0),
             "target": b["target"]} for b in base]
        t0 = time.perf_counter()
        _, _, _, m = step(params, state, opt_state, batches[0],
                          jax.random.key(3), t_params, t_state)
        jax.block_until_ready(m)
        print(f"#   compiled {name} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
        logdir = f"/tmp/uit_i16_step_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(8):
            _, _, _, m = step(params, state, opt_state, batches[i % 2],
                              jax.random.key(10 + i), t_params, t_state)
            jax.block_until_ready(m)
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:8]
        med = float(np.median(durs))
        print(f"{name}: device {med:.3f} ms/step = {B / med * 1e3:.0f} "
              f"clips/s (loss0 {float(m['total_loss']):.6f})", flush=True)
        return med

    f32 = leg("f32", True)
    i16 = leg("int16", False)
    print(f"int16 vs f32 DEVICE time: {(f32 / i16 - 1) * 100:+.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
