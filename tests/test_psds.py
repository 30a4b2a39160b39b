"""PSDS: ROC construction, area normalization, and known-value checks on
hand-built operating points; plus the harness integration on the synthetic
strong-eval world."""

import numpy as np
import pytest

from uit_mobile_tpu.evaluate.psds import psds, roc_per_class


def test_perfect_detector_scores_one():
    # one class, every threshold: all refs hit, zero FPs
    points = [{0: (10, 0, 0)} for _ in range(3)]
    out = psds(points, duration_hours=1.0)
    assert out["PSDS"] == pytest.approx(1.0)
    assert out["_per_class_auc"][0] == pytest.approx(1.0)


def test_dead_detector_scores_zero():
    points = [{0: (0, 0, 10)}, {0: (0, 5, 10)}]
    out = psds(points, duration_hours=1.0)
    assert out["PSDS"] == pytest.approx(0.0)


def test_partial_roc_area():
    """TPR 0.5 at eFPR 0 everywhere -> area = 0.5 exactly."""
    points = [{0: (5, 0, 5)}]
    out = psds(points, duration_hours=1.0, e_max=100.0)
    assert out["PSDS"] == pytest.approx(0.5)


def test_staircase_envelope_and_e_max():
    """Two operating points: (eFPR 0, TPR 0.2) and (eFPR 50, TPR 1.0)
    over e_max 100 -> area = 0.2*50 + 1.0*50 = 60 -> PSDS 0.6."""
    points = [{0: (2, 0, 8)}, {0: (10, 50, 0)}]
    out = psds(points, duration_hours=1.0, e_max=100.0)
    assert out["PSDS"] == pytest.approx(0.6)
    # beyond e_max the high-FP point is unreachable
    out2 = psds(points, duration_hours=1.0, e_max=40.0)
    assert out2["PSDS"] == pytest.approx(0.2)


def test_across_class_std_penalty():
    """Two classes at TPR 1.0 and 0.0 (no FPs): mean 0.5, std 0.5 ->
    alpha_st=1 wipes the score."""
    points = [{0: (5, 0, 0), 1: (0, 0, 5)}]
    assert psds(points, duration_hours=1.0)["PSDS"] == pytest.approx(0.5)
    assert psds(points, duration_hours=1.0,
                alpha_st=1.0)["PSDS"] == pytest.approx(0.0)


def test_classes_without_references_excluded():
    # class 7 has only FPs (no refs): must not enter the mean
    points = [{0: (5, 0, 0), 7: (0, 3, 0)}]
    assert psds(points, duration_hours=1.0)["PSDS"] == pytest.approx(1.0)


def test_roc_monotone_envelope():
    points = [{0: (8, 0, 2)}, {0: (5, 10, 5)}]  # worse TPR at higher eFPR
    curves = roc_per_class(points, duration_hours=1.0, classes=[0])
    arr = curves[0]
    assert (np.diff(arr[:, 1]) >= 0).all()
    assert arr[-1, 1] == pytest.approx(0.8)


def test_more_sweep_points_never_lower_psds():
    coarse = [{0: (2, 0, 8)}, {0: (10, 50, 0)}]
    fine = coarse + [{0: (6, 10, 4)}]
    a = psds(coarse, duration_hours=1.0)["PSDS"]
    b = psds(fine, duration_hours=1.0)["PSDS"]
    assert b >= a


def test_empty_points():
    assert psds([], duration_hours=1.0)["PSDS"] == 0.0
