"""Profiling/tracing hooks (SURVEY §5.1 gap — the reference has none).

Usage:
    with trace("/tmp/jax-trace"):          # view in xprof/tensorboard
        fwd(batch).block_until_ready()

    with step_timer() as t:
        ...
    t.elapsed_ms
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block (device + host timelines)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        return False


def device_dispatch_ms(logdir: str, min_gap_us: float = 500.0) -> list[float]:
    """Per-dispatch DEVICE durations (ms) from the newest jax.profiler
    trace under ``logdir``.

    Parses the trace JSON's device ('X') events on the busiest device op
    timeline and clusters them into dispatches at idle gaps longer than
    ``min_gap_us`` — valid when the traced region ran BLOCKING dispatches
    (each separated by a host round trip, >=1 ms through any real link),
    which is how bench.py's latency probes run. Each cluster's summed busy
    time is one dispatch's device duration; the returned list feeds
    p50/p99. This is the trustworthy latency measure in this environment:
    wall-clock p50 through the remote-TPU relay is pure tunnel RTT
    (PERF_NOTES.md 'Measurement caveats').
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items()
                   if "TPU" in n or "device" in n.lower()}
    rows = defaultdict(list)  # (pid, tid) -> [(ts, dur)]
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            rows[(e["pid"], e["tid"])].append((e["ts"], e.get("dur", 0)))
    if not rows:
        return []
    evs = max(rows.values(), key=lambda v: sum(d for _, d in v))
    evs.sort()
    clusters, busy, prev_end = [], 0.0, None
    for ts, dur in evs:
        if prev_end is not None and ts - prev_end > min_gap_us and busy:
            clusters.append(busy)
            busy = 0.0
        busy += dur
        prev_end = ts + dur if prev_end is None else max(prev_end, ts + dur)
    if busy:
        clusters.append(busy)
    return [c / 1e3 for c in clusters]


def device_memory_stats() -> dict:
    """Per-device live memory (the reference's CUDA peak-memory micro-bench
    analogue, uit.py:658-663)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out
