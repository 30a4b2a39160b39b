"""Why is the B=1 serving program 3x slower than B=2?

tools/probe_b1_latency.py measured the production fast forward at
0.474 ms/dispatch for ONE clip vs 0.151 ms for TWO — the batch-1 program
is pathological, not latency-bound (every B in 2..64 beats it). This
probe prints the per-op device-time table for B=1 and B=2 side by side
so the pathological op is named with a number.

Run:  timeout 3000 python tools/probe_b1_optable.py
"""

import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LOGDIR = "/tmp/uit_b1_optable"


def op_rows(logdir: str):
    """All device (pid, tid) rows -> [(ts, dur, name)], plus pid names.

    The module-level row holds ONE jit_fn event per dispatch; the per-op
    breakdown lives on a different tid — callers pick by event count."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pids.items()
                   if "TPU" in n or "device" in n.lower()}
    rows = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            rows[(e["pid"], e["tid"])].append(
                (e["ts"], e.get("dur", 0), e["name"]))
    return rows, tids


def main():
    import jax
    import jax.numpy as jnp

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ops.pipeline import make_forward_fn
    from uit_mobile_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    assert dev.platform == "tpu", "op-table probe needs the real chip"
    print(f"# device {dev}", flush=True)

    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  mel_layout="tfb")
    params, state = models.build(cfg, jax.random.key(0))
    fwd = jax.jit(make_forward_fn(cfg, params, state, use_pallas=True,
                                  precision="fast"))
    rng = np.random.default_rng(0)
    base = rng.integers(-8000, 8000, size=(4, 16000), dtype=np.int16)

    for B in (1, 2):
        bufs = [jnp.asarray(base[:B]), jnp.asarray(base[B:2 * B])]
        fwd(bufs[0]).block_until_ready()
        fwd(bufs[1]).block_until_ready()
        logdir = f"{LOGDIR}_{B}"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(20):
            fwd(bufs[i % 2]).block_until_ready()
        jax.profiler.stop_trace()
        rows, tids = op_rows(logdir)
        print(f"\n== B={B} rows:", flush=True)
        for key, evs in sorted(rows.items(), key=lambda kv: -len(kv[1])):
            busy = sum(d for _, d, _ in evs)
            print(f"  row {key} ({tids.get(key, '?')}): {len(evs)} events, "
                  f"busy {busy / 20 / 1e3:.3f} ms/dispatch", flush=True)
        # per-op table from the row with the most events (the op timeline)
        from collections import defaultdict

        evs = max(rows.values(), key=len)
        per_op = defaultdict(lambda: [0.0, 0])
        for _, d, n in evs:
            per_op[n][0] += d
            per_op[n][1] += 1
        top = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:18]
        for name, (us, cnt) in top:
            print(f"  {us / 20:>8.1f} us  x{cnt / 20:<5.1f} {name[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
