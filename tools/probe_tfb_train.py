"""tfb-vs-bft TRAINING layout A/B at the frontier config.

The round-4 fwd-program profile charged 0.66 ms/step (B=1024) to the
'bft' row-kernel's frames-relayout copy (f32[104,512,1024] {2,1,0} ->
{1,0,2}) plus ~0.09 ms for the wav transpose — the copies the serving
'tfb' layout eliminated in round 2. This probe measures the tfb TRAIN
branch (models/uit.forward train-mode tfb + patch_embed_tfb_train +
tfb spec augments) same-session at B=1024, bf16 student, bf16 teacher,
scan K=16, with spec augments ON (the real recipe).

Run:  timeout 3000 python tools/probe_tfb_train.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, K = 1024, 16


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.augment.spec import parse_spectransforms
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_multi_step, make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# device {jax.devices()[0]}", flush=True)
    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    fe_bft = make_frontend_fn(None, use_pallas=on_tpu, precision="fast",
                              layout="bft")
    fe_tfb = make_frontend_fn(None, use_pallas=on_tpu, precision="fast",
                              layout="tfb")
    spec = [{"TimeMasking": {"time_mask_param": 20}},
            {"FrequencyMasking": {"freq_mask_param": 8}},
            {"FrequencyMasking": {"freq_mask_param": 8}}]

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

    results = {}
    for layout, fe, psl_fe in (("bft", fe_bft, None), ("tfb", fe_tfb, fe_bft)):
        cfg = models.get_model_config("uit_xs", outputdim=537,
                                      target_length=102,
                                      compute_dtype="bfloat16",
                                      mel_layout=layout)
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        step = jax.jit(make_multi_step(
            make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                            psl_cfg=psl_cfg, psl_split=B // 2,
                            spec_augment=parse_spectransforms(spec,
                                                              layout=layout),
                            frontend_fn=fe, psl_frontend_fn=psl_fe),
            psl=True), donate_argnums=(0, 1, 2))
        opt_state = opt.init(params)
        keys = jax.random.split(jax.random.key(7), K)
        t0 = time.perf_counter()
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[0], keys,
                                           psl_params, psl_state)
        jax.block_until_ready(m)
        print(f"#   compiled {layout} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
        loss0 = float(np.asarray(m["total_loss"])[0])
        n_disp = 2
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            params, state, opt_state, m = step(params, state, opt_state,
                                               blocks[i % 2], keys,
                                               psl_params, psl_state)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * K)
        results[layout] = (dt, loss0)
        print(f"{layout}: {dt * 1e3:7.2f} ms/step {B / dt:9.0f} clips/s  "
              f"loss0={loss0:.4f}", flush=True)

    (dt_b, l_b), (dt_t, l_t) = results["bft"], results["tfb"]
    print(f"# tfb vs bft: {(dt_b / dt_t - 1) * 100:+.1f}%  "
          f"loss drift {abs(l_b - l_t):.6f}", flush=True)


if __name__ == "__main__":
    main()
