"""Batch-size knee re-check at the round-4 FINAL train composition.

The B=1024 knee was measured at the pre-tfb composition (bft student,
scan-8, f32/bf16 — tools/probe_train_frontier.py); since then the tfb
student layout and the transposed-kernel teacher mel removed ~1.5 ms of
relayout copies and the step's live-memory profile changed. Re-check
B in {1024, 1536, 2048} at the shipped frontier (tfb bf16 student,
bf16 teacher via tfb_to_bft, flat PSL, scan K=16) to confirm 1024 is
still the knee or move the default.

Run:  timeout 3000 python tools/probe_b_recheck.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    fe_teacher = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                                  precision="fast", layout="tfb_to_bft")
    t_params, t_state = models.build(psl_cfg, jax.random.key(1))

    def run(B):
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
        del batches
        keys = jax.random.split(jax.random.key(7), K)
        t0 = time.perf_counter()
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[0], keys,
                                           t_params, t_state)
        jax.block_until_ready(m)
        print(f"#   compiled B={B} ({time.perf_counter() - t0:.0f}s)",
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
        print(f"B={B}: {dt * 1e3:.2f} ms/step = {B / dt:.0f} clips/s "
              f"(loss0 {loss0:.4f})", flush=True)

    for B in (1024, 1536, 2048):
        try:
            run(B)
        except Exception as e:  # OOM is a legitimate verdict
            print(f"B={B}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)


if __name__ == "__main__":
    main()
