"""bf16 PSL teacher A/B: the round-4 breakdown charges the MobileNetV2
teacher 2.78 ms of the 10.77 ms B=1024 train step (26%) — the largest
single component after the student forward. This probe measures
MobileNetV2Config(compute_dtype='bfloat16') same-session:

  1. teacher-only device time (profiler busy-time) f32 vs bf16 at B=512
     (the B/2 slice the PSL step scores)
  2. teacher probs drift on-chip (target quality for PSL)
  3. full frontier train step (B=1024 bf16 student + scan K=16) with an
     f32 vs bf16 teacher, wall ms/step

Run:  timeout 3000 python tools/probe_teacher_bf16.py
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

    frontend = make_frontend_fn(None, use_pallas=on_tpu, precision="fast")
    t_params, t_state = models.build(
        models.get_model_config("MobileNetV2", outputdim=527),
        jax.random.key(1))
    wav_half = [jnp.asarray(rng.standard_normal((B // 2, 16000))
                            .astype(np.float32) * 0.1) for _ in range(2)]

    def teacher_ms(dtype):
        cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype=dtype)
        fwd = jax.jit(lambda w: models.apply(cfg, t_params, t_state, w,
                                             frontend_fn=frontend))
        fwd(wav_half[0]).block_until_ready()
        fwd(wav_half[1]).block_until_ready()
        logdir = f"/tmp/uit_teacher_{dtype}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(8):
            out = fwd(wav_half[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        durs = sorted(device_dispatch_ms(logdir), reverse=True)[:8]
        return float(np.median(durs)), np.asarray(out)

    ms32, p32 = teacher_ms("float32")
    ms16, p16 = teacher_ms("bfloat16")
    drift = float(np.max(np.abs(p32 - p16)))
    print(f"teacher device ms (B={B // 2}): f32 {ms32:.3f}  bf16 {ms16:.3f} "
          f"({ms32 / ms16:.2f}x)  probs drift {drift:.2e}", flush=True)

    # full frontier step with each teacher dtype
    def step_ms(teacher_dtype):
        psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                          compute_dtype=teacher_dtype)
        cfg = models.get_model_config("uit_xs", outputdim=537,
                                      target_length=102,
                                      compute_dtype="bfloat16")
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_multi_step(
            make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                            psl_cfg=psl_cfg, psl_split=B // 2,
                            frontend_fn=frontend), psl=True),
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
        print(f"#   compiled step teacher={teacher_dtype} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        loss0 = float(np.asarray(m["total_loss"])[0])
        n_disp = 2
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            params, state, opt_state, m = step(params, state, opt_state,
                                               blocks[i % 2], keys,
                                               t_params, t_state)
        jax.block_until_ready(m)
        return (time.perf_counter() - t0) / (n_disp * K), loss0

    dt32, l32 = step_ms("float32")
    dt16, l16 = step_ms("bfloat16")
    print(f"full step B={B} K={K} (bf16 student): teacher-f32 "
          f"{dt32 * 1e3:.2f} ms ({B / dt32:.0f} clips/s)  teacher-bf16 "
          f"{dt16 * 1e3:.2f} ms ({B / dt16:.0f} clips/s)  "
          f"[{(dt32 / dt16 - 1) * 100:+.1f}%]  loss0 {l32:.4f} vs {l16:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
