"""Metric suite (host-side, epoch-accumulated).

Mirrors the reference registry (utils.py:75-164): mAP / per-class AP /
lwlrap / ROC-AUC / micro+macro P/R/F1 at threshold 0.2 /
PositiveMultiClass_Accuracy / BCE / error rate, computed once over the
full epoch's (predictions, targets) — plus the GSC keyword-spotting
accuracy protocol (evaluate.py:212-229) as a vectorized function.

sklearn stays the backend for AP/lwlrap exactly as in the reference
(ignite EpochMetric wrapped sklearn); probabilities arrive as numpy from
the device.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, List

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    average_precision_score,
    f1_score,
    label_ranking_average_precision_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

THRESHOLD = 0.2  # the reference's fixed decision threshold


def _binarize(y_pred):
    return (y_pred > THRESHOLD).astype(np.float32)


def _ap_per_class(y_pred: np.ndarray, y_true: np.ndarray) -> np.ndarray:
    """Per-class AP with NaN (not sklearn>=1.4's 0.0) for classes absent
    from the split — the reference's np.nanmean (utils.py:136-141) means
    SKIP absent classes; averaging in zeros would silently deflate mAP on
    any eval subset missing some of the 527 classes."""
    ap = np.asarray(average_precision_score(y_true, y_pred, average=None),
                    dtype=np.float64)
    ap[np.asarray(y_true).sum(axis=0) == 0] = np.nan
    return ap


def lwlrap(y_pred: np.ndarray, y_true: np.ndarray) -> float:
    """Label-weighted label-ranking AP (reference utils.py:42-54)."""
    sample_weight = np.sum(y_true > 0, axis=1)
    nz = np.flatnonzero(sample_weight > 0)
    if nz.size == 0:  # no positive rows: score is undefined, not a crash
        return 0.0
    return float(
        label_ranking_average_precision_score(
            y_true[nz, :] > 0, y_pred[nz, :], sample_weight=sample_weight[nz]
        )
    )


def roc_auc(y_pred, y_true) -> float:
    try:
        return float(roc_auc_score(y_true, y_pred, average="macro"))
    except ValueError:
        return 0.0


def positive_multiclass_accuracy(y_pred, y_true) -> float:
    """Argmax accuracy over samples that have at least one positive label
    (reference utils.py:68-73)."""
    valid = y_true.max(-1) > 0
    if not valid.any():  # no positive rows: undefined, not a crash after
        return 0.0       # the whole (expensive) inference epoch
    return float(
        accuracy_score(y_true[valid].argmax(-1), y_pred[valid].argmax(-1))
    )


def bce(y_pred, y_true, eps=1e-7) -> float:
    p = np.clip(y_pred, eps, 1 - eps)
    return float(-np.mean(y_true * np.log(p) + (1 - y_true) * np.log1p(-p)))


def error_rate(y_pred, y_true) -> float:
    """1 - accuracy, usable on real model outputs.

    The reference registers raw ``accuracy_score(targets, probabilities)``
    (utils.py:157-160), which sklearn rejects for any non-binary multilabel
    input — the metric could never run. Working semantics: single-label
    targets (one-hot rows or an index vector) score argmax accuracy;
    multilabel targets score exact-match subset accuracy of predictions
    binarized at 0.5."""
    t = np.asarray(y_true)
    p = np.asarray(y_pred)
    if t.ndim == 1:
        pred = p.argmax(-1) if p.ndim > 1 else p
        return float(1.0 - np.nan_to_num(accuracy_score(t, pred)))
    one_hot = np.isin(t, (0.0, 1.0)).all() and np.allclose(t.sum(-1), 1.0)
    if one_hot:
        return float(1.0 - np.nan_to_num(accuracy_score(t.argmax(-1), p.argmax(-1))))
    return float(1.0 - np.nan_to_num(accuracy_score(t, (p >= 0.5).astype(t.dtype))))


ALL_EVAL_METRICS: Dict[str, Callable[[np.ndarray, np.ndarray], float | np.ndarray]] = {
    "mAP": lambda p, t: float(np.nanmean(_ap_per_class(p, t))),
    "AP": lambda p, t: _ap_per_class(p, t),
    "mAPAudioset": lambda p, t: float(np.nanmean(_ap_per_class(p, t)[:527])),
    "mAPKWS": lambda p, t: float(np.nanmean(_ap_per_class(p, t)[527:])),
    # the reference registry spells it 'lwlwrap' (utils.py:153 — its own
    # typo, kept for config compatibility); 'lwlrap' is the real name
    "lwlwrap": lwlrap,
    "lwlrap": lwlrap,
    "AUC": roc_auc,
    "PositiveMultiClass_Accuracy": positive_multiclass_accuracy,
    "Precision": lambda p, t: precision_score(t, _binarize(p), average=None, zero_division=0),
    "Recall": lambda p, t: recall_score(t, _binarize(p), average=None, zero_division=0),
    "Macro_Precision": lambda p, t: float(
        precision_score(t, _binarize(p), average="macro", zero_division=0)
    ),
    "Macro_Recall": lambda p, t: float(
        recall_score(t, _binarize(p), average="macro", zero_division=0)
    ),
    "Micro_Precision": lambda p, t: float(
        precision_score(t, _binarize(p), average="micro", zero_division=0)
    ),
    "Micro_Recall": lambda p, t: float(
        recall_score(t, _binarize(p), average="micro", zero_division=0)
    ),
    "Macro_F1": lambda p, t: float(f1_score(t, _binarize(p), average="macro", zero_division=0)),
    "Micro_F1": lambda p, t: float(f1_score(t, _binarize(p), average="micro", zero_division=0)),
    "BCELoss": bce,
    "ErrorRate": error_rate,
    # beyond the reference registry: expected calibration error over all
    # (clip, class) sigmoid cells (evaluate.calibration — 15 bins)
    "ECE": lambda p, t: _ece(p, t),
}


def _ece(p, t):
    from .calibration import ece

    return ece(p, t)


def compute_metrics(names: List[str], y_pred: np.ndarray, y_true: np.ndarray):
    with warnings.catch_warnings():
        # classes absent from a (small) eval split make sklearn emit a
        # warning per class; AP for them is NaN and nanmean handles it —
        # exactly the reference's behavior (utils.py:137)
        warnings.filterwarnings(
            "ignore", message="No positive class found", category=UserWarning
        )
        return {name: ALL_EVAL_METRICS[name](y_pred, y_true) for name in names}


def kws_operating_metrics(y_pred: np.ndarray, y_true_multihot: np.ndarray,
                          threshold: float = 0.2, n_audioset: int = 527) -> dict:
    """Deployment-grade keyword-spotting metrics beyond the reference's
    single accuracy number: per-keyword false-reject rate, the filler
    false-accept rate (any keyword fires on a non-keyword clip), and
    per-keyword recall at the operating threshold.
    """
    y_pred = np.asarray(y_pred, dtype=np.float32)
    y = np.asarray(y_true_multihot).argmax(-1)
    kw_scores = y_pred[:, n_audioset:]
    fires = kw_scores >= threshold  # (B, n_kw)

    filler = y < n_audioset
    out: dict = {}
    if filler.any():
        out["filler_false_accept_rate"] = float(fires[filler].any(-1).mean())
    frr, recall = {}, {}
    for k in range(kw_scores.shape[1]):
        cls = n_audioset + k
        pos = y == cls
        if pos.any():
            fired = fires[pos, k]
            frr[cls] = float(1.0 - fired.mean())
            # recall counts a hit only when the fired keyword is also the
            # top-scoring keyword
            top_kw = kw_scores[pos].argmax(-1) == k
            recall[cls] = float((fired & top_kw).mean())
    out["false_reject_rate_per_keyword"] = frr
    out["recall_per_keyword"] = recall
    if frr:
        out["macro_false_reject_rate"] = float(np.mean(list(frr.values())))
    return out


def gsc_accuracy(y_pred: np.ndarray, y_true_multihot: np.ndarray,
                 threshold: float = 0.2, n_audioset: int = 527,
                 tie_mode: str = "first") -> float:
    """The GSC keyword-spotting accuracy protocol — a vectorized
    re-statement of the reference's decision rule (evaluate.py:212-229):

    1. Among the AudioSet classes keep only the per-sample maximum score,
       zero the rest ("filler" collapses to its best class).
    2. The ground-truth label is the argmax of the multihot target; if it
       is an AudioSet index (<527, i.e. a non-keyword "filler" word), the
       target is REWRITTEN to the predicted AudioSet argmax — any AudioSet
       prediction counts as correct filler rejection.
    3. If any keyword score >= threshold, the surviving AudioSet argmax
       score is zeroed (keywords take precedence at the operating point).
    4. Prediction = argmax over the masked vector; accuracy vs the
       (possibly rewritten) targets.

    Tie handling — the ONE knowing divergence from the reference:
    ``tie_mode='first'`` (default) keeps only the FIRST argmax among
    exact-float-tied AudioSet maxima, so a firing keyword always wins
    step 3. The reference's equality mask (evaluate.py:217-219) keeps
    ALL tied columns but step 3 zeros only the first (its
    ``max_filer_score_idx``), so on an exact tie with a keyword fired the
    reference can still pick the SECOND tied AudioSet column where this
    default picks the keyword. The divergence needs bit-equal sigmoid
    outputs in two of 527 columns — unobserved on real models — but
    ``tie_mode='reference'`` reproduces the reference's mask bit-for-bit
    if the 97.76 parity gate ever lands on such a tie.

    This quirky protocol is behaviorally load-bearing: GSC Accuracy@0.2 =
    97.76 for uit_xs is a BASELINE parity gate.
    """
    assert tie_mode in ("first", "reference"), tie_mode
    y_pred = np.asarray(y_pred, dtype=np.float32).copy()
    y = np.asarray(y_true_multihot).argmax(-1)

    as_scores = y_pred[:, :n_audioset]
    as_argmax = as_scores.argmax(-1)
    rows = np.arange(len(as_scores))
    if tie_mode == "reference":
        # the reference's equality mask: every column bit-equal to the row
        # max survives (evaluate.py:214-219)
        masked_as = np.where(
            as_scores == as_scores.max(-1, keepdims=True), as_scores, 0.0
        )
    else:
        # keep exactly ONE surviving AudioSet column — the first argmax
        masked_as = np.zeros_like(as_scores)
        masked_as[rows, as_argmax] = as_scores[rows, as_argmax]
    y_pred[:, :n_audioset] = masked_as

    filler = y < n_audioset
    y = np.where(filler, as_argmax, y)

    any_kw = (y_pred[:, n_audioset:] >= threshold).any(-1)
    y_pred[np.arange(len(y_pred)), as_argmax] = np.where(
        any_kw, 0.0, y_pred[np.arange(len(y_pred)), as_argmax]
    )

    return float((y_pred.argmax(-1) == y).mean())


# ----------------------------------------------------- strong-label segments

def segment_events_to_targets(times: np.ndarray, events, num_classes: int,
                              min_overlap: float = 0.5) -> np.ndarray:
    """Rasterize strong labels onto framewise segments.

    times: (S, 2) [start, end) seconds (models.apply_framewise output).
    events: iterable of (class_index, onset_s, offset_s).
    A segment is positive for a class when the event covers at least
    `min_overlap` of the segment (or of the event, whichever is shorter —
    so events shorter than one segment still register).
    -> (S, num_classes) multi-hot.
    """
    times = np.asarray(times, dtype=np.float64)
    out = np.zeros((times.shape[0], num_classes), dtype=np.float32)
    seg_len = times[:, 1] - times[:, 0]
    for cls, on, off in events:
        ov = np.minimum(times[:, 1], off) - np.maximum(times[:, 0], on)
        denom = np.minimum(seg_len, max(off - on, 1e-9))
        out[ov / np.maximum(denom, 1e-9) >= min_overlap, int(cls)] = 1.0
    return out


def segment_f1(framewise_probs: np.ndarray, segment_targets: np.ndarray,
               threshold: float = 0.5) -> dict:
    """Segment-based strong-label scores (DCASE-style segment evaluation):
    binarize per (segment, class) at `threshold`, report micro/macro F1,
    precision and recall over all segments x classes.

    framewise_probs: (S, C) (single clip) or (B*S, C) stacked segments.
    segment_targets: same shape multi-hot (segment_events_to_targets).
    """
    p = (np.asarray(framewise_probs) >= threshold).astype(np.int32)
    t = np.asarray(segment_targets).astype(np.int32)
    assert p.shape == t.shape, (p.shape, t.shape)
    return {
        "Segment_Micro_F1": float(f1_score(t, p, average="micro", zero_division=0)),
        "Segment_Macro_F1": float(f1_score(t, p, average="macro", zero_division=0)),
        "Segment_Micro_Precision": float(
            precision_score(t, p, average="micro", zero_division=0)
        ),
        "Segment_Micro_Recall": float(
            recall_score(t, p, average="micro", zero_division=0)
        ),
    }


def segment_counts(framewise_probs: np.ndarray, segment_targets: np.ndarray,
                   threshold=0.5):
    """Per-class (TP, FP, FN) int64 vectors for one clip/batch of segments
    — the streaming building block behind ``segment_f1``: accumulate these
    across flushes and finish with ``segment_scores_from_counts`` instead
    of caching every clip's (S, C) probabilities (O(classes) memory vs
    O(clips x segments x classes) — Evaluator.strong's sweep path)."""
    p = np.asarray(framewise_probs) >= threshold
    t = np.asarray(segment_targets) >= 0.5
    assert p.shape == t.shape, (p.shape, t.shape)
    tp = (p & t).sum(0).astype(np.int64)
    fp = (p & ~t).sum(0).astype(np.int64)
    fn = (~p & t).sum(0).astype(np.int64)
    return tp, fp, fn


def segment_scores_from_counts(tp: np.ndarray, fp: np.ndarray,
                               fn: np.ndarray) -> dict:
    """``segment_f1``'s four scores from per-class TP/FP/FN count vectors.
    Matches sklearn's micro/macro with zero_division=0 bit-for-bit: micro
    from the summed counts, macro F1 averaged over ALL C classes (absent
    classes contribute 0, sklearn's multilabel-indicator semantics)."""
    tp, fp, fn = (np.asarray(x, np.int64) for x in (tp, fp, fn))

    def f1(tp, fp, fn):
        denom = 2 * tp + fp + fn
        return np.where(denom > 0, 2 * tp / np.maximum(denom, 1), 0.0)

    TP, FP, FN = tp.sum(), fp.sum(), fn.sum()
    return {
        "Segment_Micro_F1": float(f1(TP, FP, FN)),
        "Segment_Macro_F1": float(f1(tp, fp, fn).mean()),
        "Segment_Micro_Precision": float(TP / (TP + FP) if TP + FP else 0.0),
        "Segment_Micro_Recall": float(TP / (TP + FN) if TP + FN else 0.0),
    }


def kws_threshold_sweep(y_pred: np.ndarray, y_true_multihot: np.ndarray,
                        thresholds=None, n_audioset: int = 527,
                        tie_mode: str = "first") -> dict:
    """Operating curve across decision thresholds: GSC accuracy, filler
    false-accept rate and macro false-reject rate per threshold — the
    deployment tuning view behind the reference's single Accuracy@0.2
    number. ``tie_mode`` is forwarded to gsc_accuracy so the curve uses
    the SAME protocol as the headline number (a mixed-protocol curve
    would disagree with Accuracy@t on exact-float ties).
    -> {threshold: {metric: value}} (sorted by threshold)."""
    if thresholds is None:
        thresholds = (0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9)
    out: dict = {}
    for t in sorted(thresholds):
        op = kws_operating_metrics(y_pred, y_true_multihot, threshold=t,
                                   n_audioset=n_audioset)
        row = {"Accuracy": gsc_accuracy(y_pred, y_true_multihot, threshold=t,
                                        n_audioset=n_audioset,
                                        tie_mode=tie_mode)}
        for k in ("filler_false_accept_rate", "macro_false_reject_rate"):
            if k in op:
                row[k] = op[k]
        out[float(t)] = row
    return out
