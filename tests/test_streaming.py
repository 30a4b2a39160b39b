"""Sliding-window streaming tagger: hop cadence, window content, triggers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.serve.streaming import (
    Event,
    MultiStreamTagger,
    StreamingConfig,
    StreamingTagger,
)


@pytest.fixture(scope="module")
def model():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_hop_cadence_and_window_content(model):
    cfg, params, state = model
    sc = StreamingConfig(hop_seconds=0.25)
    tagger = StreamingTagger(cfg, params, state, config=sc)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(32000).astype(np.float32) * 0.1

    events = []
    for start in range(0, 32000, 1000):  # feed in 62.5 ms chunks
        events.extend(tagger.feed_audio(audio[start:start + 1000]))
    # first event once 1s is buffered, then every 0.25s: t=1.0,1.25,...,2.0
    times = [e.time for e in events]
    assert times == pytest.approx([1.0 + 0.25 * i for i in range(5)])

    # the last event's window must equal the direct forward on the last 1s
    direct = np.asarray(models.apply(cfg, params, state, jnp.asarray(audio[None, -16000:])))
    np.testing.assert_allclose(events[-1].probs, direct[0], atol=1e-5)


def test_trigger_refractory(model):
    cfg, params, state = model
    sc = StreamingConfig(hop_seconds=0.25, threshold=0.0, refractory_seconds=0.6)
    tagger = StreamingTagger(cfg, params, state, config=sc)
    audio = np.zeros(24000, dtype=np.float32)
    events = tagger.feed_audio(audio)
    # threshold 0 -> every keyword fires on the first event, then respects
    # the 0.6 s refractory (hops at 1.0, 1.25, 1.5): fires at 1.0, skips
    # 1.25/1.5 for the same class
    assert len(events) == 3
    assert len(events[0].triggers) == 10
    assert events[1].triggers == []
    assert events[2].triggers == []


def test_multi_stream_batched_step(model):
    cfg, params, state = model
    sc = StreamingConfig(hop_seconds=0.25)
    tagger = MultiStreamTagger(cfg, params, state, n_streams=3, config=sc)
    rng = np.random.default_rng(1)
    hop = int(0.25 * 16000)
    events = []
    for step in range(8):  # 2 seconds
        chunks = rng.standard_normal((3, hop)).astype(np.float32) * 0.1
        events.extend(tagger.feed_all(chunks))
    # streams become due after 4 hops -> 5 scoring rounds x 3 streams
    assert len(events) == 5 * 3
    assert {e.stream for e in events} == {0, 1, 2}


# ------------------------------------------------------- online SED events

def test_online_event_hysteresis_and_close():
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    det = OnlineEventDetector(on_threshold=0.5, off_threshold=0.3,
                              n_audioset=4, window_seconds=1.0)
    p = np.zeros(4, np.float32)

    # below on-threshold: nothing opens
    p[2] = 0.4
    assert det.update(0, 1.0, p) == []
    # opens at 0.6; onset = window start = time - 1.0
    p[2] = 0.6
    assert det.update(0, 1.25, p) == []
    # hysteresis: 0.4 is between off and on -> run stays open
    p[2] = 0.4
    assert det.update(0, 1.5, p) == []
    # drops below off-threshold -> closes, covering through the last
    # warm window
    p[2] = 0.1
    (ev,) = det.update(0, 1.75, p)
    assert (ev.stream, ev.cls) == (0, 2)
    assert ev.onset == pytest.approx(0.25)   # 1.25 - window 1.0
    assert ev.offset == pytest.approx(1.5)
    assert ev.peak_prob == pytest.approx(0.6)
    # fully closed: nothing lingers
    assert det.update(0, 2.0, p) == [] and det.flush() == []


def test_online_event_hang_time_bridges_dips():
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    det = OnlineEventDetector(on_threshold=0.5, off_threshold=0.5,
                              hang_seconds=0.6, n_audioset=2)
    hi, lo = np.array([0.9, 0.0]), np.array([0.0, 0.0])
    assert det.update(0, 1.0, hi) == []
    assert det.update(0, 1.25, lo) == []   # dip shorter than hang
    assert det.update(0, 1.5, hi) == []    # re-activates, same run
    assert det.update(0, 1.75, lo) == []
    assert det.update(0, 2.0, lo) == []
    (ev,) = det.update(0, 2.25, lo)        # 0.75 s below > hang 0.6
    assert ev.cls == 0 and ev.offset == pytest.approx(1.5)


def test_online_event_min_duration_and_flush():
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    det = OnlineEventDetector(on_threshold=0.5, off_threshold=0.5,
                              min_duration=1.2, n_audioset=2)
    hi = np.array([0.9, 0.0])
    lo = np.zeros(2)
    # a single-window blip covers exactly window_seconds (1.0 < 1.2): pruned
    det.update(0, 1.0, hi)
    assert det.update(0, 1.25, lo) == []
    # a long run survives and flush() closes it at end of stream
    for k in range(4):
        assert det.update(0, 2.0 + 0.25 * k, hi) == []
    (ev,) = det.flush()
    assert ev.onset == pytest.approx(1.0) and ev.offset == pytest.approx(2.75)


def test_online_event_streams_are_independent():
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    det = OnlineEventDetector(on_threshold=0.5, off_threshold=0.5,
                              n_audioset=2)
    hi, lo = np.array([0.9, 0.0]), np.zeros(2)
    det.update(0, 1.0, hi)
    det.update(1, 1.0, hi)
    # closing stream 0 must not touch stream 1's run
    (ev0,) = det.update(0, 1.5, lo)
    assert ev0.stream == 0
    (ev1,) = det.flush(stream=1)
    assert ev1.stream == 1 and det.flush() == []


def test_online_event_class_subset():
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    det = OnlineEventDetector(on_threshold=0.5, off_threshold=0.5,
                              classes=[3], n_audioset=8)
    p = np.zeros(8)
    p[1] = 0.9   # untracked class: ignored
    p[3] = 0.9
    det.update(0, 1.0, p)
    evs = det.flush()
    assert [e.cls for e in evs] == [3]


def test_online_event_per_class_thresholds():
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    # tuned file shape: class 2 opens at 0.3, everyone else at 0.8;
    # scalar off clamps per class (off_2 = min(0.3, 0.3))
    det = OnlineEventDetector(on_threshold={2: 0.3, "default": 0.8},
                              off_threshold=0.3, n_audioset=4)
    p = np.zeros(4, np.float32)
    p[1] = 0.5   # below its 0.8 on-threshold: never opens
    p[2] = 0.35  # above its tuned 0.3: opens
    assert det.update(0, 1.0, p) == []
    evs = det.flush()
    assert [e.cls for e in evs] == [2]

    # spec entries beyond the tracked range are ignored, not an error
    det2 = OnlineEventDetector(on_threshold={530: 0.1, 1: 0.2},
                               off_threshold=0.1, n_audioset=4)
    p = np.zeros(4)
    p[1] = 0.25
    det2.update(0, 1.0, p)
    assert [e.cls for e in det2.flush()] == [1]

    # explicit scalar pair with off > on still fails fast
    with pytest.raises(AssertionError):
        OnlineEventDetector(on_threshold=0.3, off_threshold=0.5)


def test_online_detector_on_tagger_output(model):
    """Round trip: tagger window events drive the online detector."""
    from uit_mobile_tpu.serve.streaming import OnlineEventDetector

    cfg, params, state = model
    sc = StreamingConfig(hop_seconds=0.5)
    tagger = StreamingTagger(cfg, params, state, config=sc)
    det = OnlineEventDetector(on_threshold=0.0, off_threshold=0.0,
                              classes=[0])  # always-on: plumbing check
    rng = np.random.default_rng(0)
    closed = []
    for _ in range(4):
        for ev in tagger.feed_audio(rng.standard_normal(8000).astype(np.float32) * 0.1):
            closed += det.update(ev.stream, ev.time, ev.probs)
    closed += det.flush()
    assert len(closed) == 1  # one continuous run over the whole stream
    (ev,) = closed
    assert ev.cls == 0 and ev.offset > ev.onset >= 0.0


def test_int16_buffers_bitwise_for_pcm_sources(model):
    """dtype='int16' ring buffers must give bitwise-identical window
    probabilities for PCM-sourced audio (raw int16 chunks or their
    normalized-f32 decodings)."""
    from uit_mobile_tpu.frontend import normalize_pcm16

    cfg, params, state = model
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(24000) * 3000).astype(np.int16)

    ev_f32, ev_i16, ev_i16_from_f32 = [], [], []
    for dtype, chunks, out in (
        ("float32", normalize_pcm16(pcm), ev_f32),
        ("int16", pcm, ev_i16),
        ("int16", normalize_pcm16(pcm), ev_i16_from_f32),  # quantize round-trip
    ):
        sc = StreamingConfig(hop_seconds=0.5, dtype=dtype)
        t = StreamingTagger(cfg, params, state, config=sc)
        for lo in range(0, 24000, 4000):
            out.extend(t.feed_audio(chunks[lo:lo + 4000]))
    assert len(ev_f32) == len(ev_i16) == len(ev_i16_from_f32) > 0
    for a, b, c in zip(ev_f32, ev_i16, ev_i16_from_f32):
        np.testing.assert_array_equal(b.probs, c.probs)  # quantize is exact
        np.testing.assert_allclose(a.probs, b.probs, atol=1e-6)


def test_feed_all_matches_per_stream_feed(model):
    """The vectorized all-streams ring advance must equal per-stream
    feed() exactly (content and cadence)."""
    cfg, params, state = model
    rng = np.random.default_rng(4)
    S, hop = 3, 4000
    audio = (rng.standard_normal((S, 24000)) * 3000).astype(np.int16)

    sc = StreamingConfig(hop_seconds=0.25, dtype="int16")
    t_vec = MultiStreamTagger(cfg, params, state, n_streams=S, config=sc)
    t_seq = MultiStreamTagger(cfg, params, state, n_streams=S, config=sc)
    got_vec, got_seq = [], []
    for lo in range(0, 24000, hop):
        got_vec.extend(t_vec.feed_all(audio[:, lo:lo + hop]))
        for s in range(S):
            got_seq.extend(t_seq.feed(s, audio[s, lo:lo + hop]))
    assert len(got_vec) == len(got_seq) > 0
    key = lambda e: (e.time, e.stream)
    for a, b in zip(sorted(got_vec, key=key), sorted(got_seq, key=key)):
        assert (a.stream, a.time) == (b.stream, b.time)
        np.testing.assert_array_equal(a.probs, b.probs)


def test_mixed_feed_after_device_ring_rebuilds_host(model):
    """Steady-state feed_all leaves the host mirror stale (device ring is
    authoritative); a subsequent per-stream feed() must rebuild it so
    window content stays exact."""
    cfg, params, state = model
    rng = np.random.default_rng(5)
    S, hop = 2, 4000
    audio = (rng.standard_normal((S, 40000)) * 3000).astype(np.int16)
    sc = StreamingConfig(hop_seconds=0.25, dtype="int16")

    t_mix = MultiStreamTagger(cfg, params, state, n_streams=S, config=sc)
    t_ref = MultiStreamTagger(cfg, params, state, n_streams=S, config=sc)
    # 6 hops via feed_all (device ring engages), reference via feed()
    for lo in range(0, 24000, hop):
        t_mix.feed_all(audio[:, lo:lo + hop])
        for s in range(S):
            t_ref.feed(s, audio[s, lo:lo + hop])
    # now switch to per-stream feed() for the rest
    got, want = [], []
    for lo in range(24000, 40000, hop):
        for s in range(S):
            got.extend(t_mix.feed(s, audio[s, lo:lo + hop]))
            want.extend(t_ref.feed(s, audio[s, lo:lo + hop]))
    assert len(got) == len(want) > 0
    for a, b in zip(got, want):
        assert (a.stream, a.time) == (b.stream, b.time)
        np.testing.assert_array_equal(a.probs, b.probs)
