"""Per-op device-time table for the SHIPPED frontier train step.

PERF_NOTES (round 4) ends with: tfb step device time 9.39 ms, "the
biggest remaining items are the two mel kernels and the encoder jvp
fusions". That was measured before the tfb_to_bft teacher-mel route
landed. This probe traces the FINAL shipped composition — B=1024, tfb
bf16 student, bf16 teacher, transposed-kernel teacher mel, flat PSL,
mixup + spec augments + grad clip + AdamW, scan K=16 — and prints the
per-op-name device-time totals (normalized per step), so any remaining
chargeable item (RNG, copies, BN stats, layout changes) is named with a
number before we decide whether anything is left to optimize.

Run:  timeout 3000 python tools/probe_train_optable.py
"""

import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, K = 1024, 16
LOGDIR = "/tmp/uit_train_optable"


def op_table(logdir: str):
    """(pid,tid)-busiest device timeline -> {op name: total us}."""
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items()
                   if "TPU" in n or "device" in n.lower()}
    rows = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            rows[(e["pid"], e["tid"])].append(
                (e["ts"], e.get("dur", 0), e["name"]))
    evs = max(rows.values(), key=lambda v: sum(d for _, d, _ in v))
    evs.sort()
    per_op = defaultdict(lambda: [0.0, 0])
    for _, d, n in evs:
        per_op[n][0] += d
        per_op[n][1] += 1
    busy = sum(d for _, d, _ in evs)
    span = evs[-1][0] + evs[-1][1] - evs[0][0]
    return per_op, busy, span, len(evs)


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
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device {dev}", flush=True)

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=527,
                                      compute_dtype="bfloat16")
    t_params, t_state = models.build(psl_cfg, jax.random.key(1))
    psl_fe = make_frontend_fn(psl_cfg.frontend, use_pallas=on_tpu,
                              precision="fast", layout="tfb_to_bft")
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  compute_dtype="bfloat16", mel_layout="tfb")
    fe = make_frontend_fn(cfg.frontend, use_pallas=on_tpu, precision="fast",
                          layout="tfb")
    spec = [{"TimeMasking": {"time_mask_param": 20}},
            {"FrequencyMasking": {"freq_mask_param": 8}},
            {"FrequencyMasking": {"freq_mask_param": 8}}]
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_multi_step(
        make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                        psl_cfg=psl_cfg, psl_split=B // 2,
                        spec_augment=parse_spectransforms(spec, layout="tfb"),
                        frontend_fn=fe, psl_frontend_fn=psl_fe),
        psl=True), donate_argnums=(0, 1, 2))

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
    params, state, opt_state, m = step(params, state, opt_state, blocks[0],
                                       keys, t_params, t_state)
    jax.block_until_ready(m)
    print(f"# compiled ({time.perf_counter() - t0:.0f}s)  "
          f"loss0={float(np.asarray(m['total_loss'])[0]):.6f}", flush=True)

    # steady state, then trace 2 scanned dispatches (2*K steps)
    for i in range(2):
        keys = jax.random.split(jax.random.key(50 + i), K)
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[i % 2], keys,
                                           t_params, t_state)
    jax.block_until_ready(m)
    n_disp = 2
    shutil.rmtree(LOGDIR, ignore_errors=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(LOGDIR)
    for i in range(n_disp):
        keys = jax.random.split(jax.random.key(100 + i), K)
        params, state, opt_state, m = step(params, state, opt_state,
                                           blocks[i % 2], keys,
                                           t_params, t_state)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / (n_disp * K)
    print(f"# wall {wall * 1e3:.2f} ms/step = {B / wall:.0f} clips/s",
          flush=True)

    per_op, busy, span, n_ev = op_table(LOGDIR)
    steps = n_disp * K
    print(f"# device busy {busy / 1e3 / steps:.3f} ms/step  "
          f"idle {(span - busy) / 1e3 / steps:.3f} ms/step  "
          f"({n_ev} events / {steps} steps)", flush=True)
    print(f"{'ms/step':>9}  {'count/step':>10}  op")
    for n, (d, c) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{d / 1e3 / steps:9.4f}  {c / steps:10.1f}  {n[:100]}",
              flush=True)


if __name__ == "__main__":
    main()
