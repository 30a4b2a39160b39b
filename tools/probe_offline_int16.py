"""Offline-PSL step input dtype A/B: f32 vs raw int16 PCM blocks.

The teacher-free step (PERF_NOTES round 5: 7.92 ms = 129.3k clips/s)
still reads (K, B, 16000) float32 wav blocks; the int16 train path
(round 4) feeds PCM straight to the mel kernels bitwise-exactly and
halves the framing gather's HBM traffic — the serving side measured
+23% from the same change. Training moves fewer relative bytes (the
backward pass dominates), so the expected win is a few percent.

Run:  timeout 3000 python tools/probe_offline_int16.py
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
    fe = make_frontend_fn(cfg.frontend, use_pallas=on_tpu,
                          precision="fast", layout="tfb")
    step_fn = make_train_step(cfg, optax.adamw(1e-3), mixup_alpha=0.3,
                              max_grad_norm=1.0, frontend_fn=fe)

    rng = np.random.default_rng(0)
    pcm = [rng.integers(-8000, 8000, size=(B, 16000), dtype=np.int16)
           for _ in range(4)]
    tgt = [(rng.uniform(size=(B, 537)) > 0.95).astype(np.float32)
           for _ in range(4)]

    def blocks(dtype):
        out = []
        for j in range(2):
            wavs = [pcm[(j + i) % 4] if dtype == "int16"
                    else pcm[(j + i) % 4].astype(np.float32) / 32768.0
                    for i in range(K)]
            out.append(jax.block_until_ready({
                "wav": jnp.stack([jnp.asarray(w) for w in wavs]),
                "target": jnp.stack([jnp.asarray(tgt[(j + i) % 4])
                                     for i in range(K)]),
            }))
        return out

    def run(name, dtype):
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_multi_step(step_fn), donate_argnums=(0, 1, 2))
        blk = blocks(dtype)
        keys = jax.random.split(jax.random.key(7), K)
        t0 = time.perf_counter()
        params, state, opt_state, m = step(params, state, opt_state,
                                           blk[0], keys)
        jax.block_until_ready(m)
        print(f"#   compiled {name} ({time.perf_counter() - t0:.0f}s)",
              flush=True)
        loss0 = float(np.asarray(m["total_loss"])[0])
        n_disp = 4
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), K)
            params, state, opt_state, m = step(params, state, opt_state,
                                               blk[i % 2], keys)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * K)
        print(f"{name}: {dt * 1e3:.2f} ms/step = {B / dt:,.0f} clips/s "
              f"(loss0 {loss0:.6f})", flush=True)
        return dt, loss0

    dt_f, l_f = run("offline step, f32 blocks  ", "float32")
    dt_i, l_i = run("offline step, int16 blocks", "int16")
    print(f"int16 speedup {dt_f / dt_i:.3f}x ({(dt_f / dt_i - 1) * 100:+.1f}%)"
          f"  loss drift {abs(l_f - l_i):.2e} (must be 0: bitwise fold)",
          flush=True)


if __name__ == "__main__":
    main()
