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
