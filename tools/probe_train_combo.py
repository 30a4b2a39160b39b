"""Train-step combo A/B: flat PSL batches x compute dtype x multi-step scan.

Round-3 measured each lever separately (PERF_NOTES): preassembled flat
batches +23% (f32), bf16 encoder +23% (dict batches), multi-step scan
K=8 on top of bf16. This probe measures the COMBINATIONS same-process
at B=512 so the train headline rests on one session's relay clock:

  f32-flat            bench.py's train record (the parity-grade mode)
  bf16-flat           + compute_dtype='bfloat16'
  f32-flat-scan8      + make_multi_step K=8 (8 optimizer updates/dispatch)
  bf16-flat-scan8     all three levers

Also pins loss agreement (f32 variants to 4 decimals; bf16 to ~1e-2 of
f32 — matmul rounding only, master params stay f32).

Run on the real chip:  timeout 900 python tools/probe_train_combo.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 512
K = 8
STEPS = 16  # per-step variants: 16 dispatches; scan variants: 2 dispatches


def main():
    global B, STEPS
    if "--cpu-smoke" in sys.argv:  # logic check on host: tiny shapes
        import jax

        jax.config.update("jax_platforms", "cpu")
        B, STEPS = 8, K
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_multi_step, make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# device {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    frontend = make_frontend_fn(None, use_pallas=True, precision="fast")

    def flat_batch():
        return {
            "wav": jnp.asarray(rng.standard_normal((B, 16000))
                               .astype(np.float32) * 0.1),
            "target": jnp.asarray((rng.uniform(size=(B, 537)) > 0.95)
                                  .astype(np.float32)),
        }

    data = [flat_batch() for _ in range(4)]

    def build(compute_dtype, scan):
        cfg = models.get_model_config(
            "uit_xs", outputdim=537, target_length=102,
            compute_dtype=compute_dtype)
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                               psl_cfg=psl_cfg, psl_split=B // 2,
                               frontend_fn=frontend)
        if scan:
            step = make_multi_step(step, psl=True)
        return params, state, opt_state, jax.jit(step, donate_argnums=(0, 1, 2))

    variants = [("f32-flat", "float32", False),
                ("bf16-flat", "bfloat16", False),
                ("f32-flat-scan8", "float32", True),
                ("bf16-flat-scan8", "bfloat16", True)]
    results, first_losses = {}, {}
    for name, dt, scan in variants:
        params, state, opt_state, step = build(dt, scan)
        key = jax.random.key(7)
        if scan:
            # (K, ...) stacked batches; stride by j so the two dispatch
            # blocks differ (relay-dedup hygiene)
            def stack(j):
                return jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[data[(j + i) % len(data)] for i in range(K)])

            blocks = [jax.block_until_ready(stack(j)) for j in range(2)]
            # keys[0] == the per-step variants' first key, so the
            # first-step losses are comparable across all four variants
            keys = jnp.stack([key, *jax.random.split(key, K - 1)])
            params, state, opt_state, m = step(params, state, opt_state,
                                               blocks[0], keys,
                                               psl_params, psl_state)
            jax.block_until_ready(m)  # compile
            first_losses[name] = float(np.asarray(m["total_loss"])[0])
            n_disp = STEPS // K
            t0 = time.perf_counter()
            for i in range(n_disp):
                keys = jax.random.split(jax.random.key(100 + i), K)
                params, state, opt_state, m = step(
                    params, state, opt_state, blocks[i % 2], keys,
                    psl_params, psl_state)
            jax.block_until_ready(m)
            dt_s = (time.perf_counter() - t0) / (n_disp * K)
        else:
            params, state, opt_state, m = step(params, state, opt_state,
                                               data[0], key,
                                               psl_params, psl_state)
            jax.block_until_ready(m)  # compile
            first_losses[name] = float(m["total_loss"])
            t0 = time.perf_counter()
            for i in range(STEPS):
                key, k = jax.random.split(key)
                params, state, opt_state, m = step(
                    params, state, opt_state, data[i % len(data)], k,
                    psl_params, psl_state)
            jax.block_until_ready(m)
            dt_s = (time.perf_counter() - t0) / STEPS
        results[name] = dt_s
        print(f"{name:16s} {dt_s * 1e3:7.2f} ms/step  "
              f"{B / dt_s:9.0f} clips/s  first_loss={first_losses[name]:.4f}",
              flush=True)

    base = results["f32-flat"]
    for name, dt_s in results.items():
        print(f"# {name:16s} speedup vs f32-flat: {base / dt_s:.3f}x")
    # loss sanity: keys[0] == per-step key, so the f32 scan variant's
    # first step is the SAME computation — must agree to f32 epsilon;
    # bf16 differs only by matmul rounding
    d_scan = abs(first_losses["f32-flat"] - first_losses["f32-flat-scan8"])
    d_bf16 = abs(first_losses["f32-flat"] - first_losses["bf16-flat"])
    print(f"# first-step loss drift: scan={d_scan:.6f} bf16={d_bf16:.6f}")
    assert d_scan < 1e-4, f"scan sequencing changed step math: {d_scan}"
    assert d_bf16 < 2e-2, f"bf16 drift beyond rounding: {d_bf16}"


if __name__ == "__main__":
    main()
