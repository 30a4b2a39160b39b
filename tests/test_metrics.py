"""Metric suite + GSC Accuracy@0.2 protocol tests.

The GSC protocol is verified two ways: hand-constructed cases with known
answers, and a literal per-sample transcription of the reference decision
rule (evaluate.py:212-229) compared against the vectorized implementation
on random batches.
"""

import numpy as np
import pytest

from uit_mobile_tpu.evaluate.metrics import (
    ALL_EVAL_METRICS,
    bce,
    compute_metrics,
    gsc_accuracy,
    lwlrap,
    positive_multiclass_accuracy,
)


def test_map_simple():
    t = np.array([[1, 0], [0, 1], [1, 0]], dtype=np.float32)
    p = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]], dtype=np.float32)
    assert ALL_EVAL_METRICS["mAP"](p, t) == pytest.approx(1.0)
    ap = ALL_EVAL_METRICS["AP"](p, t)
    assert ap.shape == (2,)


def test_sliced_maps():
    rng = np.random.default_rng(0)
    C = 537
    t = (rng.random((64, C)) < 0.05).astype(np.float32)
    t[:, 530] = (rng.random(64) < 0.5)
    p = rng.random((64, C)).astype(np.float32)
    m = compute_metrics(["mAPAudioset", "mAPKWS"], p, t)
    assert 0 <= m["mAPAudioset"] <= 1 and 0 <= m["mAPKWS"] <= 1


def test_positive_multiclass_accuracy():
    t = np.array([[0, 1, 0], [0, 0, 0], [1, 0, 0]], dtype=np.float32)
    p = np.array([[0.1, 0.9, 0], [0.9, 0, 0], [0.8, 0.1, 0.1]], dtype=np.float32)
    # middle sample has no positives -> dropped; the other two correct
    assert positive_multiclass_accuracy(p, t) == pytest.approx(1.0)


def test_bce_matches_closed_form():
    p = np.array([[0.8, 0.2]], dtype=np.float32)
    t = np.array([[1.0, 0.0]], dtype=np.float32)
    want = -(np.log(0.8) + np.log(0.8)) / 2
    assert bce(p, t) == pytest.approx(want, rel=1e-5)


# ------------------------------------------------------------- GSC protocol

def _gsc_reference_rule(y_pred, y_tar, threshold=0.2):
    """Literal per-sample transcription of reference evaluate.py:212-229."""
    y_pred = y_pred.copy()
    mask = np.ones_like(y_pred)
    keep = y_pred[:, :527].max(axis=1, keepdims=True)
    mask[:, :527] = (y_pred[:, :527] == keep).astype(np.float32)
    y_pred = y_pred * mask
    y = y_tar.argmax(-1)
    for i, scores in enumerate(y_pred):
        max_filler = scores[0:527].argmax(-1)
        if y[i] < 527:
            y[i] = max_filler
        for score in scores[527:]:
            if score >= threshold:
                y_pred[i][max_filler] = 0.0
    return float((y_pred.argmax(-1) == y).mean())


def test_gsc_matches_reference_rule_random():
    rng = np.random.default_rng(1)
    for _ in range(5):
        p = rng.random((64, 537)).astype(np.float32)
        labels = rng.choice([0, 528, 530, 536, 3], size=64)
        t = np.zeros((64, 537), dtype=np.float32)
        t[np.arange(64), labels] = 1.0
        assert gsc_accuracy(p, t) == pytest.approx(_gsc_reference_rule(p, t))


def test_gsc_hand_cases():
    C = 537
    # case 1: true keyword 530, keyword prob 0.9 -> correct
    p = np.zeros((1, C), np.float32); t = np.zeros((1, C), np.float32)
    p[0, 100] = 0.5; p[0, 530] = 0.9; t[0, 530] = 1
    assert gsc_accuracy(p, t) == 1.0
    # case 2: true keyword 530 but keyword prob below threshold AND below
    # the AudioSet max -> predicted filler -> wrong
    p = np.zeros((1, C), np.float32); t = np.zeros((1, C), np.float32)
    p[0, 100] = 0.5; p[0, 530] = 0.15; t[0, 530] = 1
    assert gsc_accuracy(p, t) == 0.0
    # case 3: filler word (label 0=Speech); any AudioSet argmax counts as
    # correct rejection as long as no keyword fires
    p = np.zeros((1, C), np.float32); t = np.zeros((1, C), np.float32)
    p[0, 312] = 0.4; t[0, 0] = 1
    assert gsc_accuracy(p, t) == 1.0
    # case 4: filler word but keyword fires >= 0.2 -> false accept -> wrong
    p = np.zeros((1, C), np.float32); t = np.zeros((1, C), np.float32)
    p[0, 312] = 0.4; p[0, 528] = 0.3; t[0, 0] = 1
    assert gsc_accuracy(p, t) == 0.0


def test_kws_operating_metrics():
    from uit_mobile_tpu.evaluate.metrics import kws_operating_metrics

    C = 537
    p = np.zeros((4, C), np.float32)
    t = np.zeros((4, C), np.float32)
    # keyword 530: one hit, one miss
    t[0, 530] = 1; p[0, 530] = 0.9
    t[1, 530] = 1; p[1, 530] = 0.05
    # filler clip with a false keyword fire
    t[2, 0] = 1; p[2, 533] = 0.5
    # clean filler
    t[3, 0] = 1; p[3, 100] = 0.8
    m = kws_operating_metrics(p, t)
    assert m["false_reject_rate_per_keyword"][530] == pytest.approx(0.5)
    assert m["recall_per_keyword"][530] == pytest.approx(0.5)
    assert m["filler_false_accept_rate"] == pytest.approx(0.5)
    assert m["macro_false_reject_rate"] == pytest.approx(0.5)


def test_lwlrap_perfect():
    t = np.array([[1, 0, 0], [0, 1, 1]], dtype=np.float32)
    p = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.9]], dtype=np.float32)
    assert lwlrap(p, t) == pytest.approx(1.0)


def test_map_skips_absent_classes():
    """Classes with zero positives in the split must be SKIPPED (the
    reference's nanmean intent), not averaged in as sklearn>=1.4's 0.0 —
    a perfect detector on the present classes scores mAP 1.0."""
    t = np.zeros((6, 5), np.float32)
    t[:3, 0] = 1.0
    t[3:, 2] = 1.0
    p = t * 0.9 + 0.01
    out = compute_metrics(["mAP", "AP"], p, t)
    assert out["mAP"] == pytest.approx(1.0)
    ap = np.asarray(out["AP"])
    assert np.isnan(ap[1]) and np.isnan(ap[3]) and np.isnan(ap[4])


def test_metrics_survive_all_negative_targets():
    """An all-negative eval slice must neither crash (lwlrap, positive
    accuracy) nor report perfect recall (Micro_Recall zero_division)."""
    t = np.zeros((4, 5), np.float32)
    p = np.random.default_rng(0).uniform(0.0, 0.1, (4, 5)).astype(np.float32)
    out = compute_metrics(
        ["Micro_Recall", "Macro_Recall", "lwlwrap", "lwlrap",
         "PositiveMultiClass_Accuracy"], p, t)
    assert out["Micro_Recall"] == 0.0
    assert out["Macro_Recall"] == 0.0
    assert out["lwlwrap"] == 0.0 and out["lwlrap"] == 0.0
    assert out["PositiveMultiClass_Accuracy"] == 0.0
