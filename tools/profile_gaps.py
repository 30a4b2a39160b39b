"""Profiler deep-dive: where does device time go inside one serving batch?

Traces the fast int16 forward (the bench.py headline path; --layout
picks tfb (default, headline) or the btf/bft comparators) and parses the
raw trace JSON: per-op-timeline totals, the op table, and the largest
gaps between consecutive device ops. This analysis is what resolved the
round-2 "untracked ~2.8 ms" (it was ~645 small ops, mostly layout
copies — zero device idle) and motivated the tfb layout.

Usage:  python tools/profile_gaps.py [--batch 2048] [--iters 8]
                                     [--layout tfb|btf|bft]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_trace(logdir: str, batch: int, iters: int, layout: str = "tfb"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uit_mobile_tpu import models
    from uit_mobile_tpu.frontend import quantize_pcm16
    from uit_mobile_tpu.ops import make_frontend_fn

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102,
                                  mel_layout=layout)
    params, state = models.build(cfg, jax.random.key(0))
    fe = make_frontend_fn(cfg.frontend, use_pallas=on_tpu, precision="fast",
                          layout=layout)
    fwd = jax.jit(lambda p, s, w: models.apply(cfg, p, s, w, frontend_fn=fe))

    rng = np.random.default_rng(0)
    wavs = [
        jnp.asarray(quantize_pcm16(
            rng.standard_normal((batch, 16000)).astype(np.float32) * 0.1))
        for _ in range(2)
    ]
    fwd(params, state, wavs[0]).block_until_ready()  # compile
    for _ in range(3):  # steady state
        fwd(params, state, wavs[1]).block_until_ready()

    jax.profiler.start_trace(logdir)
    out = None
    for i in range(iters):
        out = fwd(params, state, wavs[i % 2])
    out.block_until_ready()
    jax.profiler.stop_trace()


def analyze(logdir: str, top: int = 25):
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    pids = {}  # pid -> process name
    tids = {}  # (pid, tid) -> thread name
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"]["name"]

    device_pids = {p for p, n in pids.items()
                   if "TPU" in n or "device" in n.lower()}
    print("processes:", {p: pids[p] for p in sorted(pids)}, file=sys.stderr)

    # complete events on device timelines
    rows = defaultdict(list)  # (pid, tid) -> [(ts, dur, name)]
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            rows[(e["pid"], e["tid"])].append(
                (e["ts"], e.get("dur", 0), e["name"]))

    for key, evs in sorted(rows.items()):
        evs.sort()
        name = tids.get(key, str(key))
        total_span = evs[-1][0] + evs[-1][1] - evs[0][0]
        busy = sum(d for _, d, _ in evs)
        print(f"\n=== timeline {name} (pid={key[0]} tid={key[1]}): "
              f"{len(evs)} events, span {total_span/1e3:.3f} ms, "
              f"busy {busy/1e3:.3f} ms, idle {(total_span-busy)/1e3:.3f} ms")
        # per-op-name totals
        per_op = defaultdict(float)
        for _, d, n in evs:
            per_op[n] += d
        for n, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {d/1e3:9.3f} ms  {n[:110]}")
        # largest inter-op gaps
        gaps = []
        prev_end = evs[0][0] + evs[0][1]
        prev_name = evs[0][2]
        for ts, d, n in evs[1:]:
            if ts > prev_end:
                gaps.append((ts - prev_end, prev_name, n))
            prev_end = max(prev_end, ts + d)
            prev_name = n
        gaps.sort(reverse=True)
        if gaps:
            print(f"  -- total gap {sum(g for g, *_ in gaps)/1e3:.3f} ms "
                  f"in {len(gaps)} gaps; largest:")
            for g, a, b in gaps[:15]:
                print(f"     {g/1e3:7.3f} ms  after {a[:60]!r} before {b[:60]!r}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--layout", default="tfb", choices=["tfb", "btf", "bft"])
    ap.add_argument("--logdir", default="/tmp/uit_prof_gaps")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        run_trace(args.logdir, args.batch, args.iters, layout=args.layout)
    analyze(args.logdir)
