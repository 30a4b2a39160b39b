"""Strong-label segment evaluation: event rasterization + segment F1 on
framewise model output."""

import numpy as np
import jax

from uit_mobile_tpu import models
from uit_mobile_tpu.evaluate.metrics import segment_events_to_targets, segment_f1


def test_event_rasterization_overlap_rule():
    times = np.array([[0.0, 1.0], [1.0, 2.0], [2.0, 3.0]])
    # event covers [0.6, 2.2): seg0 overlap 0.4 (<0.5, off), seg1 full (on),
    # seg2 overlap 0.2 (<0.5, off)
    t = segment_events_to_targets(times, [(3, 0.6, 2.2)], num_classes=5)
    assert t.shape == (3, 5)
    np.testing.assert_array_equal(t[:, 3], [0.0, 1.0, 0.0])
    assert t.sum() == 1.0


def test_short_event_registers_via_event_relative_overlap():
    times = np.array([[0.0, 1.0], [1.0, 2.0]])
    # 0.1 s event fully inside seg0: covers only 10% of the segment but
    # 100% of the event -> must be positive
    t = segment_events_to_targets(times, [(0, 0.4, 0.5)], num_classes=2)
    np.testing.assert_array_equal(t[:, 0], [1.0, 0.0])


def test_segment_f1_perfect_and_noise():
    t = np.array([[1, 0], [0, 1], [0, 0]], np.float32)
    perfect = segment_f1(t * 0.9 + 0.05, t, threshold=0.5)
    assert perfect["Segment_Micro_F1"] == 1.0
    flipped = segment_f1(1.0 - t, t, threshold=0.5)
    assert flipped["Segment_Micro_F1"] == 0.0


def test_segment_pipeline_on_framewise_output():
    """End-to-end: framewise model output + synthetic events -> scores."""
    cfg = models.get_model_config("uit_xxxs", outputdim=6, target_length=102,
                                  depth=1, pooling="dm")
    params, state = models.build(cfg, jax.random.key(0))
    wav = np.random.default_rng(0).standard_normal((1, 32000)).astype(np.float32) * 0.1
    probs, times = models.apply_framewise(cfg, params, state, wav)
    targets = segment_events_to_targets(times, [(2, 0.0, 1.0), (4, 1.5, 2.0)],
                                        num_classes=6)
    scores = segment_f1(np.asarray(probs)[0], targets, threshold=0.5)
    assert set(scores) == {"Segment_Micro_F1", "Segment_Macro_F1",
                           "Segment_Micro_Precision", "Segment_Micro_Recall"}
    assert all(0.0 <= v <= 1.0 for v in scores.values())