"""Train-step benchmark probe: fused PSL step wall/steady-state + bf16 A/B.

Measures (VERDICT round-2 items 3+5):
- steady-state PSL train-step throughput at B=512 with device-resident
  batches (device+dispatch; the loader-transfer side is measured in
  PERF_NOTES separately) — f32 encoder vs compute_dtype='bfloat16';
- loss agreement between the two over a few steps.

Run on the real chip:  timeout 600 python tools/probe_train.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# device {jax.devices()[0]}", file=sys.stderr)
    B = 512
    rng = np.random.default_rng(0)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    frontend = make_frontend_fn(None, use_pallas=True, precision="fast")

    def build(compute_dtype):
        cfg = models.get_model_config(
            "uit_xs", outputdim=537, target_length=102,
            compute_dtype=compute_dtype)
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(
            make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                            psl_cfg=psl_cfg, frontend_fn=frontend),
            donate_argnums=(0, 1, 2),
        )
        return params, state, opt_state, step

    def batches(n):
        out = []
        for _ in range(n):
            out.append({
                "audioset": {
                    "wav": jnp.asarray(rng.standard_normal((B // 2, 16000))
                                       .astype(np.float32) * 0.1),
                    "target": jnp.asarray((rng.uniform(size=(B // 2, 537)) > 0.95)
                                          .astype(np.float32)),
                },
                "kws": {
                    "wav": jnp.asarray(rng.standard_normal((B // 2, 16000))
                                       .astype(np.float32) * 0.1),
                    "target": jnp.asarray((rng.uniform(size=(B // 2, 537)) > 0.95)
                                          .astype(np.float32)),
                },
            })
        return out

    data = batches(4)
    key = jax.random.key(7)
    results = {}
    which = sys.argv[1:] or ["float32", "bfloat16"]
    for dt in which:
        params, state, opt_state, step = build(dt)
        losses = []
        # warmup/compile
        params, state, opt_state, m = step(params, state, opt_state, data[0],
                                           key, psl_params, psl_state)
        jax.block_until_ready(m)
        steps = 16
        t0 = time.perf_counter()
        for i in range(steps):
            key, k = jax.random.split(key)
            params, state, opt_state, m = step(params, state, opt_state,
                                               data[i % len(data)], k,
                                               psl_params, psl_state)
            losses.append(m["total_loss"])
        jax.block_until_ready(m)
        dt_s = (time.perf_counter() - t0) / steps
        results[dt] = (dt_s, [float(x) for x in losses[:4]])
        print(f"{dt}: {dt_s * 1e3:.2f} ms/step = {B / dt_s:,.0f} clips/s "
              f"trained; losses {[round(float(x), 4) for x in losses[:4]]}",
              flush=True)
    if {"float32", "bfloat16"} <= set(results):
        f32_t, bf16_t = results["float32"][0], results["bfloat16"][0]
        print(f"bf16 vs f32: {f32_t / bf16_t - 1:+.1%} throughput")


if __name__ == "__main__":
    main()
