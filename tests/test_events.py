"""Event-level SED post-processing and collar scoring (evaluate.events).

Beyond the reference: it has no sound-event-detection capability at all —
this layer turns the framewise probabilities into discrete events and
scores them with DCASE-style onset/offset collars."""

import numpy as np
import pytest

from uit_mobile_tpu.evaluate.events import (
    EventScorer,
    event_based_scores,
    extract_events,
    load_thresholds,
    median_filter_probs,
    per_class_thresholds,
    save_thresholds,
)


# ---------------------------------------------------------- median filter

def test_median_filter_identity_and_flicker():
    p = np.array([[0.0], [1.0], [0.0], [0.0], [1.0], [1.0], [1.0], [0.0]])
    assert median_filter_probs(p, 1) is p or (median_filter_probs(p, 1) == p).all()
    f = median_filter_probs(p, 3)
    # the isolated single-segment spike dies; the 3-long run survives
    np.testing.assert_array_equal(f[:, 0], [0, 0, 0, 0, 1, 1, 1, 0])


def test_median_filter_edge_replication_and_batch():
    p = np.ones((2, 5, 3), np.float32)
    f = median_filter_probs(p, 5)
    assert f.shape == (2, 5, 3)
    np.testing.assert_array_equal(f, p)  # constant input is a fixed point


def test_median_filter_rejects_even_kernel():
    with pytest.raises(AssertionError):
        median_filter_probs(np.zeros((4, 2)), 2)


# --------------------------------------------------------- event extraction

TIMES_4 = np.array([[0.0, 0.5], [0.5, 1.0], [1.0, 1.5], [1.5, 2.0]])


def test_extract_contiguous_run():
    probs = np.array([[0.1], [0.9], [0.8], [0.1]])
    assert extract_events(TIMES_4, probs) == [(0, 0.5, 1.5)]


def test_extract_merge_gap_and_min_duration():
    probs = np.array([[0.9], [0.1], [0.9], [0.1]])
    # two 0.5 s runs separated by a 0.5 s gap
    assert extract_events(TIMES_4, probs) == [(0, 0.0, 0.5), (0, 1.0, 1.5)]
    # merge_gap >= 0.5 fuses them
    assert extract_events(TIMES_4, probs, merge_gap=0.5) == [(0, 0.0, 1.5)]
    # min_duration prunes the short pieces but not the fused run
    assert extract_events(TIMES_4, probs, min_duration=0.6) == []
    assert extract_events(TIMES_4, probs, merge_gap=0.5, min_duration=0.6) == [
        (0, 0.0, 1.5)
    ]


def test_extract_handles_unsorted_overlapping_tail_windows():
    # the crop rule's tail window overlaps the previous one and segment
    # rows arrive window-major — extraction must still fuse one event
    times = np.array([[0.0, 1.0], [1.0, 2.0], [1.5, 2.5]])
    probs = np.array([[0.9], [0.9], [0.9]])
    assert extract_events(times, probs) == [(0, 0.0, 2.5)]


def test_per_class_thresholds_forms():
    # scalar broadcast
    np.testing.assert_array_equal(per_class_thresholds(0.3, 3), [0.3] * 3)
    # explicit vector passes through
    np.testing.assert_array_equal(
        per_class_thresholds([0.1, 0.2, 0.3], 3), [0.1, 0.2, 0.3])
    # mapping fills unlisted classes from 'default' (else the default arg)
    np.testing.assert_array_equal(
        per_class_thresholds({1: 0.7, "default": 0.2}, 3), [0.2, 0.7, 0.2])
    np.testing.assert_array_equal(
        per_class_thresholds({0: 0.9}, 2, default=0.4), [0.9, 0.4])
    with pytest.raises(ValueError):
        per_class_thresholds({5: 0.5}, 3)  # out of range
    with pytest.raises(ValueError):
        per_class_thresholds([0.1, 0.2], 3)  # wrong vector length


def test_extract_events_per_class_thresholds():
    probs = np.array(
        [[0.1, 0.1], [0.45, 0.45], [0.45, 0.45], [0.1, 0.1]], np.float32
    )
    # scalar 0.5: nothing fires; per-class: only the tuned class does
    assert extract_events(TIMES_4, probs) == []
    assert extract_events(TIMES_4, probs, threshold={1: 0.4}) == [
        (1, 0.5, 1.5)
    ]
    # vector form agrees with the mapping form
    assert extract_events(TIMES_4, probs, threshold=np.array([0.5, 0.4])) == [
        (1, 0.5, 1.5)
    ]
    # and a per-class vector equal everywhere == the scalar path
    lo = np.full(2, 0.4)
    assert extract_events(TIMES_4, probs, threshold=lo) == extract_events(
        TIMES_4, probs, threshold=0.4)


def test_threshold_file_roundtrip(tmp_path):
    path = tmp_path / "op.json"
    save_thresholds(path, {3: 0.25, 70: 0.6}, default=0.5)
    spec = load_thresholds(path)
    assert spec == {3: 0.25, 70: 0.6, "default": 0.5}
    vec = per_class_thresholds(spec, 80)
    assert vec[3] == 0.25 and vec[70] == 0.6 and vec[0] == 0.5


def test_extract_multiclass_and_median():
    probs = np.array(
        [[0.0, 0.0], [0.9, 0.9], [0.0, 0.9], [0.0, 0.9]], np.float32
    )
    evs = extract_events(TIMES_4, probs)
    assert evs == [(0, 0.5, 1.0), (1, 0.5, 2.0)]
    # kernel-3 median kills class 0's isolated single-segment spike but
    # leaves class 1's 3-segment run intact
    assert extract_events(TIMES_4, probs, median_kernel=3) == [(1, 0.5, 2.0)]


# ------------------------------------------------------------ collar scoring

def test_scorer_perfect_match():
    s = event_based_scores([([(0, 1.0, 2.0)], [(0, 1.0, 2.0)])])
    assert s["Event_Micro_F1"] == 1.0
    assert s["Event_Macro_F1"] == 1.0
    assert s["_event_per_class_f1"] == {0: 1.0}


def test_scorer_onset_collar_boundary():
    ref = [(0, 1.0, 2.0)]
    hit = event_based_scores([([(0, 1.19, 2.0)], ref)])
    miss = event_based_scores([([(0, 1.21, 2.0)], ref)])
    assert hit["Event_Micro_F1"] == 1.0
    assert miss["Event_Micro_F1"] == 0.0
    assert miss["Event_Micro_Precision"] == 0.0  # the stray pred is an FP
    assert miss["Event_Micro_Recall"] == 0.0


def test_scorer_offset_collar_scales_with_duration():
    # 10 s reference event: offset collar = max(0.2, 0.2*10) = 2 s
    long_ref = [(0, 0.0, 10.0)]
    assert event_based_scores([([(0, 0.0, 8.5)], long_ref)])["Event_Micro_F1"] == 1.0
    assert event_based_scores([([(0, 0.0, 7.0)], long_ref)])["Event_Micro_F1"] == 0.0
    # short event: collar floors at t_collar
    short_ref = [(0, 0.0, 0.3)]
    assert event_based_scores([([(0, 0.0, 0.45)], short_ref)])["Event_Micro_F1"] == 1.0


def test_scorer_offset_condition_off():
    s = event_based_scores(
        [([(0, 1.0, 99.0)], [(0, 1.0, 2.0)])], offset_condition=False
    )
    assert s["Event_Micro_F1"] == 1.0


def test_scorer_unique_matching_counts_duplicates_as_fp():
    # two predictions inside the collar of ONE reference: 1 TP + 1 FP
    s = EventScorer()
    s.add_clip([(0, 1.0, 2.0), (0, 1.1, 2.0)], [(0, 1.05, 2.0)])
    assert (sum(s.tp.values()), sum(s.fp.values()), sum(s.fn.values())) == (1, 1, 0)
    # nearest-onset wins: the 1.0-onset pred is the match, not 1.1
    sc = s.scores()
    assert sc["Event_Micro_Precision"] == 0.5 and sc["Event_Micro_Recall"] == 1.0


def test_scorer_class_confusion_is_fp_plus_fn():
    s = event_based_scores([([(1, 1.0, 2.0)], [(0, 1.0, 2.0)])])
    assert s["Event_Micro_F1"] == 0.0
    assert s["_event_per_class_f1"] == {0: 0.0, 1: 0.0}


def test_scorer_no_cross_clip_matching():
    # same event in different clips must NOT match each other
    s = EventScorer()
    s.add_clip([(0, 1.0, 2.0)], [])          # clip A: stray prediction
    s.add_clip([], [(0, 1.0, 2.0)])          # clip B: missed reference
    sc = s.scores()
    assert sc["Event_Micro_F1"] == 0.0
    assert (sum(s.fp.values()), sum(s.fn.values())) == (1, 1)


def test_scorer_macro_vs_micro():
    s = EventScorer()
    # class 0: 3 clean TPs; class 1: one FN
    s.add_clip(
        [(0, 0.0, 1.0), (0, 2.0, 3.0), (0, 4.0, 5.0)],
        [(0, 0.0, 1.0), (0, 2.0, 3.0), (0, 4.0, 5.0), (1, 6.0, 7.0)],
    )
    sc = s.scores()
    assert sc["Event_Macro_F1"] == pytest.approx(0.5)       # (1.0 + 0.0) / 2
    assert sc["Event_Micro_Recall"] == pytest.approx(3 / 4)
    assert sc["Event_Micro_Precision"] == 1.0


def test_empty_everything():
    sc = event_based_scores([])
    assert sc["Event_Micro_F1"] == 0.0 and sc["Event_Macro_F1"] == 0.0
    assert sc["_event_per_class_f1"] == {}


# --------------------------------------------------- model-output round trip

def test_events_from_framewise_model_output():
    import jax

    from uit_mobile_tpu import models

    cfg = models.get_model_config("uit_xxxs", outputdim=4, target_length=102,
                                  depth=1, pooling="dm")
    params, state = models.build(cfg, jax.random.key(0))
    wav = np.random.default_rng(0).standard_normal((1, 32000)).astype(np.float32) * 0.1
    probs, times = models.apply_framewise(cfg, params, state, wav)
    evs = extract_events(times, np.asarray(probs)[0], threshold=0.5,
                         median_kernel=3)
    for cls, on, off in evs:
        assert 0 <= cls < 4 and 0.0 <= on < off <= times[:, 1].max() + 1e-9
    sc = event_based_scores([(evs, [(0, 0.0, 1.0)])])
    assert 0.0 <= sc["Event_Micro_F1"] <= 1.0


# ------------------------------------------------- intersection criterion

def test_intersection_criterion_tolerates_sloppy_boundaries():
    """A long event found with imprecise edges: the 0.2 s collar rejects
    it, the PSDS-style DTC/GTC overlap rule accepts it."""
    ref = [(0, 10.0, 20.0)]
    pred = [(0, 10.5, 19.0)]  # onset off by 0.5 s, covers 85% of ref
    assert event_based_scores([(pred, ref)])["Event_Micro_F1"] == 0.0
    s = event_based_scores([(pred, ref)], criterion="intersection")
    assert s["Event_Micro_F1"] == 1.0


def test_intersection_thresholds():
    ref = [(0, 0.0, 10.0)]
    # covers 40% of ref but is fully inside it: fails gtc=0.5, passes dtc
    short = [(0, 2.0, 6.0)]
    assert event_based_scores(
        [(short, ref)], criterion="intersection")["Event_Micro_F1"] == 0.0
    assert event_based_scores(
        [(short, ref)], criterion="intersection", gtc=0.3)["Event_Micro_F1"] == 1.0
    # covers the whole ref but half the prediction hangs outside: dtc binds
    long_pred = [(0, 0.0, 25.0)]
    assert event_based_scores(
        [(long_pred, ref)], criterion="intersection")["Event_Micro_F1"] == 0.0
    assert event_based_scores(
        [(long_pred, ref)], criterion="intersection", dtc=0.4)["Event_Micro_F1"] == 1.0


def test_intersection_no_overlap_never_matches():
    s = event_based_scores(
        [([(0, 0.0, 1.0)], [(0, 2.0, 3.0)])], criterion="intersection",
        dtc=0.0, gtc=0.0)
    # zero-length intersection is negative here; even dtc=gtc=0 must not
    # match disjoint events
    assert s["Event_Micro_F1"] == 0.0


def test_median_filter_applies_in_time_order():
    """Window-major (unsorted) rows must be smoothed in TIME order: with
    rows stored [late, early, mid], a kernel-3 filter at the time-middle
    segment must see its time neighbours, not its index neighbours."""
    # three segments stored [t0, t2, t1]: index neighbours are NOT time
    # neighbours. Time-ordered probs are 1, 0, 1 -> kernel-3 medians
    # (edge-replicated) are 1, 1, 1 -> ONE event [0, 3). Filtering in
    # index order ([1, 1, 0] -> [1, 1, 0]) would leave t1 inactive and
    # split the event into [0,1) + [2,3).
    times = np.array([[0.0, 1.0], [2.0, 3.0], [1.0, 2.0]])
    probs = np.array([[1.0], [1.0], [0.0]])
    ev = extract_events(times, probs, threshold=0.5, median_kernel=3)
    assert ev == [(0, 0.0, 3.0)], ev


def test_extract_events_empty_clip():
    """Zero segments (e.g. an empty probs caller) contributes zero events
    instead of crashing the sweep, even with a median kernel."""
    ev = extract_events(np.zeros((0, 2)), np.zeros((0, 3)),
                        threshold=0.5, median_kernel=3)
    assert ev == []
