"""Training-throughput frontier: B x compute_dtype sweep + device-time
breakdown of the PSL train step.

Round 3 shipped the train fast mode (flat PSL + bf16 + scan K=8) but every
number was B=512 — serving found +52% once its ceiling was mapped, so this
probe maps training's:

  sweep   scan-K=8 dispatch (the relay-trustworthy measure: dispatch
          overhead amortized 8x) over B in {512, 1024, 2048} x
          {float32, bfloat16}, device-resident stacked blocks, ms/step +
          clips/s per cell. OOM cells are reported, not fatal.
  k16     the winning cell re-measured at K=16 (is dispatch still a term?)
  parts   per-component DEVICE time at B=512 and the winning B (profiler
          busy-time of separate jitted programs, PERF_NOTES' trusted
          method): teacher fwd / student train-mode fwd+loss / fwd+bwd /
          full step => bwd = fwd_bwd - fwd, optimizer+clip = full - fwd_bwd.

Run on the real chip (background it; compiles can take minutes each):
  timeout 3600 python tools/probe_train_frontier.py
CPU smoke (tiny shapes, logic only):
  python tools/probe_train_frontier.py --cpu-smoke
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 8
SWEEP_B = (512, 1024, 2048)
DTYPES = ("float32", "bfloat16")


def device_busy_ms(logdir: str) -> float:
    """Sum complete-event durations on the device timelines of the newest
    trace under logdir (the profile_gaps.py parsing, reduced to one
    number). Returns TOTAL busy ms across the traced region."""
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items()
                   if "TPU" in n or "device" in n.lower()}
    busy = defaultdict(float)  # (pid, tid) -> us
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            busy[(e["pid"], e["tid"])] += e.get("dur", 0)
    # op timelines can be split across tids (e.g. "TensorFlow Op" vs
    # "XLA Ops"); take the busiest single timeline to avoid double counts
    return max(busy.values(), default=0.0) / 1e3


def main():
    global K
    cpu_smoke = "--cpu-smoke" in sys.argv
    sweep_b, steps = SWEEP_B, 16
    if cpu_smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        sweep_b, steps, K = (8, 16), K, 4
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

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    frontend = make_frontend_fn(None, use_pallas=on_tpu, precision="fast")
    rng = np.random.default_rng(0)

    def make_blocks(B, k):
        """Two distinct stacked (k, B, ...) blocks, built ON DEVICE from
        host randoms in B-sized slabs (relay upload of multi-GB blocks
        would swamp setup; two blocks defeat dispatch dedup)."""
        def batch(seed):
            r = np.random.default_rng(seed)
            return {
                "wav": jnp.asarray(r.standard_normal((B, 16000))
                                   .astype(np.float32) * 0.1),
                "target": jnp.asarray((r.uniform(size=(B, 537)) > 0.95)
                                      .astype(np.float32)),
            }

        batches = [batch(s) for s in range(4)]
        blocks = [
            jax.block_until_ready(jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[batches[(j + i) % 4] for i in range(k)]))
            for j in range(2)
        ]
        return blocks

    def build_step(B, compute_dtype, scan_k):
        cfg = models.get_model_config("uit_xs", outputdim=537,
                                      target_length=102,
                                      compute_dtype=compute_dtype)
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        step = make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                               psl_cfg=psl_cfg, psl_split=B // 2,
                               frontend_fn=frontend)
        if scan_k:
            step = make_multi_step(step, psl=True)
        return cfg, params, state, opt.init(params), jax.jit(
            step, donate_argnums=(0, 1, 2))

    def measure_scan(B, dtype, k, n_disp=None):
        """ms/step for the scan-k step at (B, dtype); device-resident."""
        n_disp = n_disp or max(2, steps // k)
        cfg, params, state, opt_state, step = build_step(B, dtype, scan_k=True)
        blocks = make_blocks(B, k)
        keys = jax.random.split(jax.random.key(7), k)
        t0 = time.perf_counter()
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[0], keys,
                                           psl_params, psl_state)
        jax.block_until_ready(m)  # compile
        print(f"#   compiled B={B} {dtype} K={k} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        first_loss = float(np.asarray(m["total_loss"])[0])
        t0 = time.perf_counter()
        for i in range(n_disp):
            keys = jax.random.split(jax.random.key(100 + i), k)
            params, state, opt_state, m = step(params, state, opt_state,
                                               blocks[i % 2], keys,
                                               psl_params, psl_state)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / (n_disp * k)
        assert np.isfinite(first_loss)
        del params, state, opt_state, blocks
        return dt, first_loss

    # --kscan B DTYPE: only the K-amortization curve at one cell
    if "--kscan" in sys.argv:
        i = sys.argv.index("--kscan")
        B, dtype = int(sys.argv[i + 1]), sys.argv[i + 2]
        for k in (16, 32, 64):
            try:
                dt, _ = measure_scan(B, dtype, k, n_disp=2)
                print(f"K={k:3d} B={B} {dtype}: {dt * 1e3:7.2f} ms/step "
                      f"{B / dt:9.0f} clips/s", flush=True)
            except Exception as e:
                print(f"K={k} failed: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        return

    # ---------------------------------------------------------- sweep
    print("== sweep: scan-K=%d ms/step over B x dtype ==" % K, flush=True)
    results = {}
    for B in sweep_b:
        for dtype in DTYPES:
            try:
                dt, loss0 = measure_scan(B, dtype, K)
                results[(B, dtype)] = dt
                print(f"B={B:5d} {dtype:8s}: {dt * 1e3:7.2f} ms/step "
                      f"{B / dt:9.0f} clips/s  loss0={loss0:.4f}", flush=True)
            except Exception as e:
                print(f"B={B:5d} {dtype:8s}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)

    if not results:
        print("no sweep results; aborting", flush=True)
        return
    best = min(results, key=lambda key: results[key] / key[0])
    bB, bdt = best
    print(f"== winner: B={bB} {bdt} at {bB / results[best]:.0f} clips/s ==",
          flush=True)

    # ------------------------------------------------- K=16 at the winner
    try:
        dt16, _ = measure_scan(bB, bdt, 16, n_disp=2)
        print(f"K=16 at winner: {dt16 * 1e3:7.2f} ms/step "
              f"{bB / dt16:9.0f} clips/s", flush=True)
    except Exception as e:
        print(f"K=16 probe failed: {e}", flush=True)

    # ------------------------------------- per-component device breakdown
    # Separate jitted programs, each traced for `iters` dispatches; the
    # profiler's device busy-time is the trustworthy per-program number
    # through this relay. Differences give bwd and optimizer shares.
    def profiled_ms(tag, fn, *args, iters=8):
        logdir = f"/tmp/uit_frontier_{tag}"
        shutil.rmtree(logdir, ignore_errors=True)
        out = fn(*args)
        jax.block_until_ready(out)  # compile
        jax.block_until_ready(fn(*args))  # steady state
        jax.profiler.start_trace(logdir)
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        return device_busy_ms(logdir) / iters

    for B in sorted({512, bB} if on_tpu else {sweep_b[0]}):
        try:
            breakdown(B, bdt, profiled_ms, psl_cfg, psl_params,
                      psl_state, frontend, models, on_tpu)
        except Exception as e:
            print(f"breakdown B={B} {bdt} failed: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def breakdown(B, dtype, profiled_ms, psl_cfg, psl_params, psl_state,
              frontend, models, on_tpu):
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu.augment.mixup import (
        mixup_targets, sample_mixup_lambdas,
    )
    from uit_mobile_tpu.train.steps import bce_loss, make_train_step

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  compute_dtype=dtype)
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    r = np.random.default_rng(0)
    wav = jnp.asarray(r.standard_normal((B, 16000)).astype(np.float32) * 0.1)
    target = jnp.asarray((r.uniform(size=(B, 537)) > 0.95).astype(np.float32))
    batch = {"wav": wav, "target": target}
    key = jax.random.key(7)

    # the same student train-mode forward+loss the real step runs
    def fwd_loss(p, s, w, t, rng):
        rng_mix, rng_fwd = jax.random.split(rng)
        lamb = sample_mixup_lambdas(rng_mix, w.shape[0], 0.3)
        t = mixup_targets(t, lamb)
        probs, new_state = models.apply(cfg, p, s, w, train=True, rng=rng_fwd,
                                        mixup_lamb=lamb,
                                        frontend_fn=frontend)
        return bce_loss(probs, t), new_state

    teacher = jax.jit(lambda w: models.apply(psl_cfg, psl_params, psl_state,
                                             w, frontend_fn=frontend))
    fwd = jax.jit(fwd_loss)
    vag = jax.jit(lambda p, s, w, t, rng: jax.value_and_grad(
        fwd_loss, has_aux=True)(p, s, w, t, rng))
    # no donation: profiled_ms re-dispatches the SAME buffers each iter
    # (donating here poisons the inputs after the first call)
    full = jax.jit(
        make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                        psl_cfg=psl_cfg, psl_split=B // 2,
                        frontend_fn=frontend))

    t_teacher = profiled_ms("teacher", teacher, wav[: B // 2])
    t_fwd = profiled_ms("fwd", fwd, params, state, wav, target, key)
    t_vag = profiled_ms("vag", vag, params, state, wav, target, key)
    t_full = profiled_ms("full", full, params, state, opt_state, batch, key,
                         psl_params, psl_state)
    print(f"== device-time breakdown B={B} {dtype} (ms/step) ==", flush=True)
    print(f"  teacher fwd (B/2)        {t_teacher:7.3f}")
    print(f"  student fwd+loss         {t_fwd:7.3f}")
    print(f"  student fwd+bwd          {t_vag:7.3f}   (bwd ~ {t_vag - t_fwd:.3f})")
    print(f"  FULL step                {t_full:7.3f}   "
          f"(optimizer+clip+teacher ~ {t_full - t_vag:.3f}; "
          f"teacher alone {t_teacher:.3f})", flush=True)


if __name__ == "__main__":
    main()
