"""Offline-PSL prize measurement: the frontier train step WITH the
in-step teacher vs the teacher-free plain step (what `psl: {mode:
offline}` runs after uit-psl-cache precomputes the targets).

Round-4 breakdown (PERF_NOTES) charged the frozen MobileNetV2 teacher
2.78 ms of the ~10.1 ms B=1024 frontier step (26%). The teacher's
outputs per (clip, crop) are deterministic, so the offline mode moves
them to data prep; this probe bounds the training-throughput prize.

Both steps run the SAME composition otherwise: B=1024 flat batch, tfb
bf16 student, fast pallas frontend, mixup + grad clip + AdamW, scanned
K=16 dispatch, device-resident input blocks (measures compute, not
transfer). The offline step's targets already carry "teacher" rows —
numerically the online math with the overwrite precomputed
(tests/test_psl_offline.py pins the equivalence to f16 rounding).

Run:  timeout 3000 python tools/probe_offline_psl.py
"""

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

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  compute_dtype="bfloat16", mel_layout="tfb")
    fe_student = make_frontend_fn(cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb")
    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    fe_teacher = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb_to_bft")
    t_params, t_state = models.build(psl_cfg, jax.random.key(1))

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

    def run(name, step_fn, psl):
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_multi_step(step_fn, psl=psl),
                       donate_argnums=(0, 1, 2))
        keys = jax.random.split(jax.random.key(7), K)
        t0 = time.perf_counter()
        args = (params, state, opt_state, blocks[0], keys)
        if psl:
            args = args + (t_params, t_state)
        params, state, opt_state, m = step(*args)
        jax.block_until_ready(m)
        print(f"#   compiled {name} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
        loss0 = float(np.asarray(m["total_loss"])[0])
        n_disp = 4
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            args = (params, state, opt_state, blocks[i % 2], keys)
            if psl:
                args = args + (t_params, t_state)
            params, state, opt_state, m = step(*args)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * K)
        print(f"{name}: {dt * 1e3:.2f} ms/step = {B / dt:,.0f} clips/s "
              f"(loss0 {loss0:.6f})", flush=True)
        return dt

    online = make_train_step(cfg, optax.adamw(1e-3), mixup_alpha=0.3,
                             max_grad_norm=1.0, psl_cfg=psl_cfg,
                             psl_split=B // 2, frontend_fn=fe_student,
                             psl_frontend_fn=fe_teacher)
    offline = make_train_step(cfg, optax.adamw(1e-3), mixup_alpha=0.3,
                              max_grad_norm=1.0, frontend_fn=fe_student)

    dt_on = run("online PSL (in-step teacher)", online, psl=True)
    dt_off = run("offline PSL (teacher-free)  ", offline, psl=False)
    print(f"offline speedup: {dt_on / dt_off:.3f}x "
          f"({(dt_on / dt_off - 1) * 100:+.1f}% clips/s)", flush=True)


if __name__ == "__main__":
    main()
