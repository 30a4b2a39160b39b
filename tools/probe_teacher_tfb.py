"""Teacher-frontend layout A/B: the last unmeasured mel lever in the
round-4 train residue (PERF_NOTES: the tfb step's 9.39 ms device time
charges its biggest remaining items to "the two mel kernels").

The PSL teacher consumes a (B, F, T) 'bft' mel, so it rides the row
kernel — which pays the frames-relayout copy the tfb layout killed for
the student. Candidate: feed the teacher the TRANSPOSED 'tfb' kernel's
(T, F, B) output plus ONE explicit (2,1,0) transpose back to bft
((104, 64, 512) f32 = 13.6 MB, ~0.03 ms at HBM speed of light) — the
fast tfb kernel's mel is bitwise equal to the row kernel's on TPU
(PERF_NOTES round 2), so the transpose path should be numerically free.

Measures, same-session:
  1. teacher-only device time (profiler busy-time) at B=512, bf16
     teacher (the shipped fast mode): bft frontend vs tfb+transpose
  2. teacher probs drift between the two paths
  3. full frontier train step (B=1024, tfb bf16 student, bf16 teacher,
     scan K=16) wall ms/step with each teacher frontend

Run:  timeout 3000 python tools/probe_teacher_tfb.py
"""

import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 1024
K = 16


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_multi_step, make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache
    from uit_mobile_tpu.utils.profiling import device_dispatch_ms

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device {dev}", flush=True)
    rng = np.random.default_rng(0)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    fe_bft = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                              precision="fast")
    fe_tfb_raw = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb")

    def fe_tfb_t(w):
        # (T, F, B) -> (B, F, T): one explicit copy instead of the row
        # kernel's internal frames-relayout
        return jnp.transpose(fe_tfb_raw(w), (2, 1, 0))

    t_params, t_state = models.build(psl_cfg, jax.random.key(1))
    wav_half = [jnp.asarray(rng.standard_normal((B // 2, 16000))
                            .astype(np.float32) * 0.1) for _ in range(2)]

    def teacher_ms(name, fe):
        fwd = jax.jit(lambda w: models.apply(psl_cfg, t_params, t_state, w,
                                             frontend_fn=fe))
        fwd(wav_half[0]).block_until_ready()
        fwd(wav_half[1]).block_until_ready()
        logdir = f"/tmp/uit_teacher_fe_{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(8):
            out = fwd(wav_half[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:8]
        return float(np.median(durs)), np.asarray(out)

    ms_b, p_b = teacher_ms("bft", fe_bft)
    ms_t, p_t = teacher_ms("tfb", fe_tfb_t)
    drift = float(np.max(np.abs(p_b - p_t)))
    print(f"teacher device ms (B={B // 2}, bf16): bft {ms_b:.3f}  "
          f"tfb+T {ms_t:.3f} ({ms_b / ms_t:.2f}x)  probs drift {drift:.2e}",
          flush=True)

    # full frontier step with each teacher frontend
    def step_ms(name, psl_fe):
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
                            psl_frontend_fn=psl_fe), psl=True),
            donate_argnums=(0, 1, 2))

        def batch(seed):
            r = np.random.default_rng(seed)
            return {
                "wav": jnp.asarray(r.standard_normal((B, 16000))
                                   .astype(np.float32) * 0.1),
                "target": jnp.asarray((r.uniform(size=(B, 537)) > 0.95)
                                      .astype(np.float32)),
            }

        batches = [batch(s) for s in range(4)]
        blocks = [jax.block_until_ready(jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[batches[(j + i) % 4] for i in range(K)])) for j in range(2)]
        keys = jax.random.split(jax.random.key(7), K)
        t0 = time.perf_counter()
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[0], keys,
                                           t_params, t_state)
        jax.block_until_ready(m)
        print(f"#   compiled step psl_fe={name} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        loss0 = float(np.asarray(m["total_loss"])[0])
        n_disp = 3
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            params, state, opt_state, m = step(params, state, opt_state,
                                               blocks[i % 2], keys,
                                               t_params, t_state)
        jax.block_until_ready(m)
        return (time.perf_counter() - t0) / (n_disp * K), loss0

    dt_b, l_b = step_ms("bft", fe_bft)
    dt_t, l_t = step_ms("tfb+T", fe_tfb_t)
    print(f"full step B={B} K={K} (tfb bf16 student, bf16 teacher): "
          f"psl-bft {dt_b * 1e3:.2f} ms ({B / dt_b:.0f} clips/s)  "
          f"psl-tfb+T {dt_t * 1e3:.2f} ms ({B / dt_t:.0f} clips/s)  "
          f"[{(dt_b / dt_t - 1) * 100:+.1f}%]  loss0 {l_b:.6f} vs {l_t:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
