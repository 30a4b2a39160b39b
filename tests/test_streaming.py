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
