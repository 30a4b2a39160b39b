"""Probe: PSL step with a host-preassembled batch vs the dict-batch step.

The shipped PSL step (train/steps.py make_train_step) receives
{'audioset': {wav,target}, 'kws': {wav,target}}, normalizes each half,
and concatenates wav and target on device; the round-2 device profile
attributed ~0.7 ms/step of a 6.19 ms step to these assembly copies.
This probe measures the ceiling of removing them: a variant step takes
ONE (B,T) wav + ONE (B,C) target (halves pre-stacked host-side, which
the prefetch pipeline hides), the teacher reads wav[:n_as] as a slice,
and the teacher probs land via dynamic_update_slice.

Same optimizer/mixup/clip math as make_train_step — only the batch
assembly differs. Baseline side reuses probe_train.py's exact program
(compile-cache hit).

Run on the real chip:  timeout 900 python tools/probe_preassembled.py
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
    from uit_mobile_tpu.augment.mixup import (
        mixup_targets,
        sample_mixup_lambdas,
    )
    from uit_mobile_tpu.ops import make_frontend_fn
    from uit_mobile_tpu.train.steps import make_loss, make_train_step
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"# device {jax.devices()[0]}", file=sys.stderr)
    B = 512
    n_as = B // 2
    rng = np.random.default_rng(0)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    frontend = make_frontend_fn(None, use_pallas=True, precision="fast")
    cfg = models.get_model_config(
        "uit_xs", outputdim=537, target_length=102, compute_dtype="float32")
    params0, state0 = models.build(cfg, jax.random.key(0))
    opt = optax.adamw(1e-3)

    loss_fn = make_loss("BCELoss")

    def make_pre_step():
        def step(params, state, opt_state, batch, rng_key,
                 psl_params, psl_state):
            rng_mix, rng_fwd = jax.random.split(rng_key)
            wav = batch["wav"]          # (B, T) f32, already normalized
            target = batch["target"]    # (B, 537)
            y_t = models.apply(psl_cfg, psl_params, psl_state, wav[:n_as],
                               frontend_fn=frontend)
            y_t = jax.lax.stop_gradient(y_t)
            target = jax.lax.dynamic_update_slice(target, y_t[:, :527], (0, 0))
            mixup_lamb = sample_mixup_lambdas(rng_mix, wav.shape[0], 0.3)
            target = mixup_targets(target, mixup_lamb)

            def loss_of(p):
                probs, new_state = models.apply(
                    cfg, p, state, wav, train=True, rng=rng_fwd,
                    mixup_lamb=mixup_lamb, frontend_fn=frontend,
                )
                return loss_fn(probs, target), new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
            updates, new_opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt_state, {
                "total_loss": loss, "grad_norm": gnorm}
        return step

    def dict_batches(n):
        out = []
        for _ in range(n):
            out.append({
                "audioset": {
                    "wav": jnp.asarray(rng.standard_normal((n_as, 16000))
                                       .astype(np.float32) * 0.1),
                    "target": jnp.asarray(
                        (rng.uniform(size=(n_as, 537)) > 0.95)
                        .astype(np.float32)),
                },
                "kws": {
                    "wav": jnp.asarray(rng.standard_normal((n_as, 16000))
                                       .astype(np.float32) * 0.1),
                    "target": jnp.asarray(
                        (rng.uniform(size=(n_as, 537)) > 0.95)
                        .astype(np.float32)),
                },
            })
        return out

    def pre_batches(src):
        return [{
            "wav": jnp.concatenate([b["audioset"]["wav"], b["kws"]["wav"]]),
            "target": jnp.concatenate(
                [b["audioset"]["target"], b["kws"]["target"]]),
        } for b in src]

    data = dict_batches(4)
    pre = pre_batches(data)
    key = jax.random.key(7)
    steps = 16
    results = {}

    # A: shipped dict-batch step (identical program to probe_train.py f32)
    step_a = jax.jit(
        make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                        psl_cfg=psl_cfg, frontend_fn=frontend),
        donate_argnums=(0, 1, 2),
    )
    # B: preassembled variant
    step_b = jax.jit(make_pre_step(), donate_argnums=(0, 1, 2))

    for name, step, batches_ in (("dict", step_a, data), ("pre", step_b, pre)):
        params, state = jax.tree.map(jnp.copy, (params0, state0))
        opt_state = opt.init(params)
        params, state, opt_state, m = step(
            params, state, opt_state, batches_[0], key, psl_params, psl_state)
        jax.block_until_ready(m)
        losses = []
        k = key
        t0 = time.perf_counter()
        for i in range(steps):
            k, sk = jax.random.split(k)
            params, state, opt_state, m = step(
                params, state, opt_state, batches_[i % len(batches_)], sk,
                psl_params, psl_state)
            losses.append(m["total_loss"])
        jax.block_until_ready(m)
        dt_s = (time.perf_counter() - t0) / steps
        results[name] = dt_s
        print(f"{name}: {dt_s * 1e3:.2f} ms/step = {B / dt_s:,.0f} clips/s; "
              f"losses {[round(float(x), 4) for x in losses[:4]]}",
              flush=True)

    print(f"preassembled vs dict: {results['dict'] / results['pre'] - 1:+.1%}")


if __name__ == "__main__":
    main()
