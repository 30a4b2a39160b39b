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


# ------------------------------------------------- cross-trigger (alpha_ct)

def test_alpha_ct_zero_matches_no_ct_path():
    points = [{0: (2, 0, 8), 1: (5, 1, 5)}, {0: (10, 50, 0), 1: (8, 9, 2)}]
    cts = [{(0, 1): 3}, {(0, 1): 7}]
    durs = {0: 1.0, 1: 2.0}
    base = psds(points, duration_hours=1.0)["PSDS"]
    with_ct0 = psds(points, duration_hours=1.0, alpha_ct=0.0,
                    ct_points=cts, ref_duration_hours=durs)["PSDS"]
    assert with_ct0 == pytest.approx(base)


def test_alpha_ct_penalizes_cross_triggers():
    """Class 0 at TPR 1.0/eFPR 0 but 100 cross-triggers into class 1's
    1-hour of references: alpha_ct=1 pushes its eFPR to 100 = e_max, so
    its curve contributes nothing below e_max and the mean TPR halves."""
    points = [{0: (5, 0, 0), 1: (5, 0, 0)}]
    cts = [{(0, 1): 100}]
    durs = {0: 1.0, 1: 1.0}
    clean = psds(points, duration_hours=1.0)["PSDS"]
    pen = psds(points, duration_hours=1.0, alpha_ct=1.0,
               ct_points=cts, ref_duration_hours=durs)["PSDS"]
    assert clean == pytest.approx(1.0)
    assert pen == pytest.approx(0.5)


def test_alpha_ct_known_shift():
    """eFPR shift = alpha_ct * mean over other classes of ct/T: one other
    class, ct=50, T=2h -> shift 25/hr at alpha_ct=1; staircase area drops
    from 1.0 to (100-25)/100."""
    points = [{0: (5, 0, 0), 1: (5, 0, 0)}]
    out = psds(points, duration_hours=1.0, alpha_ct=1.0,
               ct_points=[{(0, 1): 50}], ref_duration_hours={0: 1.0, 1: 2.0})
    assert out["PSDS"] == pytest.approx((1.0 + 0.75) / 2)


def test_event_scorer_counts_cross_triggers():
    from uit_mobile_tpu.evaluate.events import EventScorer

    sc = EventScorer(criterion="intersection", dtc=0.5, gtc=0.5,
                     count_cross_triggers=True)
    # pred class 0 fully inside a class-1 ref -> FP for 0 + CT (0, 1);
    # pred class 1 matches its ref (TP, never a CT); ref durations logged
    sc.add_clip(
        pred_events=[(0, 1.0, 2.0), (1, 0.0, 3.0)],
        ref_events=[(1, 0.0, 3.0), (2, 10.0, 12.0)],
    )
    assert sc.fp[0] == 1 and sc.tp[1] == 1 and sc.fn[2] == 1
    assert sc.ct[(0, 1)] == 1 and (1, 2) not in sc.ct
    assert sc.ref_duration[1] == pytest.approx(3.0)
    assert sc.ref_duration[2] == pytest.approx(2.0)


def test_event_scorer_matched_pred_is_not_cross_trigger():
    from uit_mobile_tpu.evaluate.events import EventScorer

    sc = EventScorer(criterion="intersection", dtc=0.5, gtc=0.5,
                     count_cross_triggers=True)
    # the class-0 pred MATCHES a class-0 ref, so its overlap with the
    # class-1 ref must not count as a cross-trigger
    sc.add_clip(
        pred_events=[(0, 0.0, 2.0)],
        ref_events=[(0, 0.0, 2.0), (1, 0.0, 2.0)],
    )
    assert sc.tp[0] == 1 and not sc.ct


def test_event_scorer_cttc_threshold():
    from uit_mobile_tpu.evaluate.events import EventScorer

    # 25% overlap with the other class's ref: below the default cttc
    # (=dtc=0.5) -> no CT; an explicit cttc=0.2 counts it
    pred = [(0, 0.0, 4.0)]
    ref = [(1, 0.0, 1.0)]
    sc = EventScorer(criterion="intersection", count_cross_triggers=True)
    sc.add_clip(pred, ref)
    assert not sc.ct
    sc2 = EventScorer(criterion="intersection", count_cross_triggers=True,
                      cttc=0.2)
    sc2.add_clip(pred, ref)
    assert sc2.ct[(0, 1)] == 1


def test_alpha_ct_requires_ct_inputs():
    """alpha_ct > 0 without cross-trigger counts or reference durations
    must refuse rather than silently report the unpenalized score."""
    points = [{0: (10, 0, 0), 1: (10, 0, 0)}]
    with pytest.raises(ValueError, match="ct_points"):
        psds(points, duration_hours=1.0, alpha_ct=1.0)
    with pytest.raises(ValueError, match="ref_duration_hours"):
        psds(points, duration_hours=1.0, alpha_ct=1.0,
             ct_points=[{(0, 1): 3}])
    # fully-specified call still works
    out = psds(points, duration_hours=1.0, alpha_ct=1.0,
               ct_points=[{(0, 1): 3}], ref_duration_hours={0: 1.0, 1: 1.0})
    assert 0.0 <= out["PSDS"] <= 1.0
