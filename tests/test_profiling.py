"""utils/profiling.py: trace parsing for per-dispatch device durations.

device_dispatch_ms is the bench.py latency-probe backend (VERDICT r3
missing #3: wall p50 through the relay is tunnel RTT, device durations
are the honest latency) — pin its parsing/clustering against a synthetic
trace file so bench regressions surface off-chip.
"""

import gzip
import json

import numpy as np
import pytest

from uit_mobile_tpu.utils.profiling import device_dispatch_ms


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def _op(pid, tid, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "ts": ts, "dur": dur,
            "name": "fusion"}


def test_clusters_blocking_dispatches():
    """3 dispatches of 3 ops each, separated by >min_gap idle: three
    clusters, each the sum of its ops' busy time."""
    events = [_meta(1, "/device:TPU:0"), _meta(2, "python host")]
    t = 0
    for _ in range(3):
        for _ in range(3):
            events.append(_op(1, 7, t, 100))  # 100 us ops, back to back
            t += 120  # 20 us gaps inside a dispatch (< min_gap)
        t += 30_000  # 30 ms host round trip between dispatches
    # host-side events must be ignored entirely
    events.append(_op(2, 1, 0, 10_000_000))

    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        logdir = _write_trace(pathlib.Path(td), events)
        out = device_dispatch_ms(logdir)
    assert len(out) == 3
    np.testing.assert_allclose(out, [0.3, 0.3, 0.3])


def test_picks_busiest_device_timeline():
    """Sparse secondary timelines (infeed etc.) must not dilute the op
    timeline; only the busiest one is clustered."""
    events = [_meta(1, "/device:TPU:0 (pid 1)")]
    for i in range(4):
        events.append(_op(1, 7, i * 50_000, 2_000))  # main: 2 ms dispatches
        events.append(_op(1, 9, i * 50_000, 5))  # sparse sidecar
    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        logdir = _write_trace(pathlib.Path(td), events)
        out = device_dispatch_ms(logdir)
    np.testing.assert_allclose(out, [2.0] * 4)


def test_no_device_timeline_returns_empty():
    events = [_meta(2, "python host"), _op(2, 1, 0, 100)]
    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        logdir = _write_trace(pathlib.Path(td), events)
        assert device_dispatch_ms(logdir) == []


def test_missing_trace_raises():
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with pytest.raises(FileNotFoundError):
            device_dispatch_ms(td)


def test_overlapping_ops_cluster_once():
    """Overlapping/parallel ops within one dispatch (ts overlap) must stay
    one cluster and sum busy time (matching profile_gaps' busy metric)."""
    events = [_meta(1, "TPU device")]
    # one dispatch: two overlapping 1 ms ops, then a 40 ms gap, then another
    events += [_op(1, 7, 0, 1000), _op(1, 7, 500, 1000)]
    events += [_op(1, 7, 42_000, 1000)]
    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        logdir = _write_trace(pathlib.Path(td), events)
        out = device_dispatch_ms(logdir)
    np.testing.assert_allclose(out, [2.0, 1.0])
