"""PSDS — Polyphonic Sound Detection Score (Bilen et al., ICASSP 2020).

The field-standard threshold-independent SED metric, computed over the
operating points the strong-eval sweep already produces (one model pass,
many decision thresholds): per class, an ROC of true-positive rate vs
effective false-positive RATE (FPs per hour of audio); the PSD-ROC is the
across-class mean TPR (optionally penalized by the across-class standard
deviation, ``alpha_st``) as a function of eFPR, and PSDS is its
normalized area up to ``e_max`` FPs/hour.

Event matching uses the DTC/GTC intersection criterion
(evaluate.events.EventScorer(criterion='intersection')) — the same rule
the PSDS paper defines. Simplifications vs the reference implementation,
stated plainly:

- no cross-trigger term (alpha_ct = 0): FPs are not split by which other
  class's events they intersect;
- operating points come from the caller's threshold sweep rather than
  from every achievable decision surface — PSDS is monotonically
  non-decreasing in the number of sweep points, so a coarse sweep LOWER-
  bounds the true score.

The reference framework (RicherMans/UIT_Mobile) has no strong-label
evaluation at all; this extends the SED stack past segment/event F1 to
the metric DCASE task 4 reports.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np

OperatingPoint = Mapping[int, Tuple[int, int, int]]  # class -> (tp, fp, fn)


def roc_per_class(points: Sequence[OperatingPoint], duration_hours: float,
                  classes: Sequence[int]) -> Dict[int, np.ndarray]:
    """Per class: monotone ROC support (eFPR, TPR) from raw counts.

    Each operating point contributes (fp / duration_hours, tp / n_ref);
    the ROC is the non-decreasing upper envelope (cummax of TPR along
    sorted eFPR — the standard staircase construction)."""
    assert duration_hours > 0.0
    curves = {}
    for c in classes:
        pts = []
        for op in points:
            tp, fp, fn = op.get(c, (0, 0, 0))
            n_ref = tp + fn
            tpr = tp / n_ref if n_ref else 0.0
            pts.append((fp / duration_hours, tpr))
        pts.sort()
        arr = np.asarray(pts, dtype=np.float64)
        arr[:, 1] = np.maximum.accumulate(arr[:, 1])
        curves[c] = arr
    return curves


def _tpr_at(curve: np.ndarray, e: float) -> float:
    """Staircase lookup: best TPR among points with eFPR <= e."""
    sel = curve[:, 0] <= e + 1e-12
    return float(curve[sel, 1].max()) if sel.any() else 0.0


def psds(points: Sequence[OperatingPoint], *, duration_hours: float,
         alpha_st: float = 0.0, e_max: float = 100.0) -> dict:
    """PSDS over per-threshold (tp, fp, fn) counts.

    points: one mapping per sweep threshold, class -> (tp, fp, fn) —
    exactly ``EventScorer``'s counters. Classes are those with at least
    one reference event (TPR is undefined otherwise; pure-FP classes
    still shape other classes' curves only through their own, so they
    are excluded, matching the paper).

    Returns {'PSDS': float, '_psd_roc': {eFPR: eTPR}, per-class aucs}.
    """
    classes = sorted({
        c for op in points for c, (tp, fp, fn) in op.items() if tp + fn > 0
    })
    if not classes:
        return {"PSDS": 0.0, "_psd_roc": {}, "_per_class_auc": {}}
    curves = roc_per_class(points, duration_hours, classes)

    # support: every eFPR knot below e_max, plus the endpoints
    knots = sorted({0.0, e_max} | {
        float(e) for arr in curves.values() for e in arr[:, 0] if e < e_max
    })
    roc = {}
    for e in knots:
        tprs = np.asarray([_tpr_at(curves[c], e) for c in classes])
        roc[e] = float(tprs.mean() - alpha_st * tprs.std())
    # right-continuous staircase integral over [0, e_max]
    area = 0.0
    for (e0, v), e1 in zip(roc.items(), list(roc)[1:] + [e_max]):
        area += max(0.0, v) * (e1 - e0)
    per_class_auc = {
        c: sum(
            _tpr_at(curves[c], e0) * (e1 - e0)
            for e0, e1 in zip(knots, knots[1:] + [e_max])
        ) / e_max
        for c in classes
    }
    return {
        "PSDS": area / e_max,
        "_psd_roc": roc,
        "_per_class_auc": per_class_auc,
    }
