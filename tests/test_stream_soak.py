"""Soak: /stream sessions under concurrent load ACROSS hot reloads.

The round-3 verdict's remaining hardening ask (NEXT_STEPS round-5 #4):
the serve storm test covers TaggingService; this one storms the
StreamSessions manager — many worker threads opening/feeding/closing
sessions with random chunk sizes while a reloader thread hammers
``reload()`` with fresh weights. Invariants:

- ``reload`` NEVER swaps while sessions are active (returns False), and
  succeeds once drained — a live session's ring buffer belongs to the
  weights that scored it (serve/http.py StreamSessions.reload contract).
- every worker error is an expected capacity error (LookupError), never
  a crash/deadlock;
- after the storm: zero active sessions, every slot recycled, and a
  post-reload session scores with the NEW weights (bit-equal to a fresh
  tagger built from them).
"""

from __future__ import annotations

import random
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.serve.http import StreamSessions
from uit_mobile_tpu.serve.streaming import StreamingConfig


@pytest.fixture(scope="module")
def model():
    cfg = models.get_model_config("uit_xxxs", outputdim=537,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    params2, state2 = models.build(cfg, jax.random.key(1))
    return cfg, (params, state), (params2, state2)


def test_stream_soak_across_reloads(model):
    cfg, (params, state), (params2, state2) = model
    scfg = StreamingConfig(hop_seconds=0.5)
    ss = StreamSessions(cfg, params, state, config=scfg, max_sessions=4)

    stop = threading.Event()
    errors: list = []
    swaps = {"denied": 0, "ok": 0, "early_ok": 0}
    fed_events = {"n": 0}

    def worker(seed: int):
        rng = random.Random(seed)
        npr = np.random.default_rng(seed)
        while not stop.is_set():
            try:
                sid = ss.open()["id"]
            except LookupError:
                time.sleep(0.002)  # all slots busy — expected under storm
                continue
            try:
                for _ in range(rng.randint(1, 4)):
                    chunk = (npr.standard_normal(rng.choice([400, 4000, 9000]))
                             .astype(np.float32) * 0.05)
                    windows, _closed = ss.feed(sid, chunk)
                    fed_events["n"] += len(windows)
                ss.close(sid)
            except Exception as e:  # noqa: BLE001 — the soak's whole point
                errors.append(e)
                return

    def reloader():
        while not stop.is_set():
            try:
                if ss.reload(cfg, params2, state2):
                    # only legal if no sessions were active at that instant
                    swaps["early_ok"] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
            else:
                swaps["denied"] += 1
            time.sleep(0.01)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
    threads.append(threading.Thread(target=reloader))
    for t in threads:
        t.start()
    time.sleep(8.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "soak thread deadlocked"

    assert not errors, f"unexpected errors under storm: {errors[:3]}"
    assert fed_events["n"] > 0, "storm never produced a scored window"

    # drain: idle expiry + closes already ran; now reload must succeed
    assert ss.active_sessions == 0
    assert ss.reload(cfg, params2, state2) is True
    swaps["ok"] += 1
    assert len(ss._free) == ss.max_sessions  # every slot recycled

    # post-reload scoring uses the NEW weights: one full window through a
    # fresh session equals a direct forward under params2
    sid = ss.open()["id"]
    audio = (np.random.default_rng(7).standard_normal(16000)
             .astype(np.float32) * 0.05)
    windows, _ = ss.feed(sid, audio)
    ss.close(sid)
    assert len(windows) == 1
    direct = np.asarray(
        models.apply(cfg, params2, state2, jnp.asarray(audio[None])))
    np.testing.assert_allclose(windows[0].probs, direct[0], atol=1e-5)


def test_reload_denied_while_single_session_open(model):
    cfg, (params, state), (params2, state2) = model
    ss = StreamSessions(cfg, params, state,
                        config=StreamingConfig(hop_seconds=0.5),
                        max_sessions=2)
    sid = ss.open()["id"]
    assert ss.reload(cfg, params2, state2) is False  # deferred, not an error
    ss.close(sid)
    assert ss.reload(cfg, params2, state2) is True


def test_session_slots_survive_idle_expiry_storm(model):
    """Sessions that are never closed expire lazily; slots must recycle
    (no leak) and expired ids must raise KeyError, not corrupt state."""
    cfg, (params, state), _ = model
    ss = StreamSessions(cfg, params, state,
                        config=StreamingConfig(hop_seconds=0.5),
                        max_sessions=2, idle_seconds=0.05)
    ids = []
    for _ in range(10):  # 5x the slot count, relying on expiry to recycle
        ids.append(ss.open()["id"])
        time.sleep(0.06)
    active = ss.active_sessions  # property runs lazy expiry FIRST
    assert active + len(ss._free) == ss.max_sessions
    with pytest.raises(KeyError):
        ss.feed(ids[0], np.zeros(100, np.float32))
