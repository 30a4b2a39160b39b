"""Regression tests for round-3 review items (ADVICE + VERDICT §weak):
SED wavtransform time-preservation guard, feed_all hop realignment,
optimal event matching, single-argmax GSC tie handling, the Adam8bit
substitution warning, and the strong-eval CLI flags."""

import numpy as np
import pytest

from uit_mobile_tpu.evaluate.events import EventScorer
from uit_mobile_tpu.evaluate.metrics import gsc_accuracy


# -------------------------------------------------- SED augment guard

def test_sed_trainer_rejects_time_shifting_wavtransforms(tmp_path):
    from uit_mobile_tpu.train.sed import train_sed_from_config

    cfg = dict(
        model="uit_xxxs", batch_size=2, epochs=1,
        strong_train_data="nonexistent.tsv",
        outputpath=str(tmp_path),
        wavtransforms={"Shift": {"min_shift": -0.2, "max_shift": 0.2}},
    )
    with pytest.raises(ValueError, match="time-preserving"):
        train_sed_from_config(cfg)


def test_time_preserving_registry_matches_transforms():
    from uit_mobile_tpu.augment.wav import (
        TIME_PRESERVING_WAV_TRANSFORMS, WAV_TRANSFORMS,
    )

    assert TIME_PRESERVING_WAV_TRANSFORMS <= set(WAV_TRANSFORMS)
    assert "Shift" not in TIME_PRESERVING_WAV_TRANSFORMS


# ------------------------------------------- feed_all hop realignment

def test_feed_all_resets_partial_feed_residual():
    """A partial feed() leaves _since_hop mid-hop; feed_all absorbs the
    residual so subsequent feed() scoring boundaries stay hop-aligned."""
    from uit_mobile_tpu import models
    from uit_mobile_tpu.serve.streaming import MultiStreamTagger, StreamingConfig

    import jax

    cfg = models.get_model_config("uit_xxxs", outputdim=12, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    sc = StreamingConfig(hop_seconds=0.25, window_seconds=1.0)
    tagger = MultiStreamTagger(cfg, params, state, n_streams=2, config=sc)
    hop = int(sc.hop_seconds * sc.sample_rate)

    # partial feed: 100 samples into stream 0 (less than one hop)
    tagger.feed(0, np.zeros(100, np.float32))
    assert tagger._since_hop[0] == 100
    # an all-streams hop absorbs the residual
    tagger.feed_all(np.zeros((2, hop), np.float32))
    assert tagger._since_hop[0] == 0 and tagger._since_hop[1] == 0
    # the next feed() needs exactly one full hop to reach a boundary again
    tagger.feed(0, np.zeros(hop - 1, np.float32))
    assert tagger._since_hop[0] == hop - 1


# ------------------------------------------- optimal event assignment

def test_scorer_optimal_matching_beats_greedy():
    """refs r1, r2; p1 matches both, p2 matches only r1. A greedy
    nearest-onset pass gives r1<-p1 then r2 unmatched (1 TP, 1 FP, 1 FN);
    the optimal assignment is r1<-p2, r2<-p1 (2 TP)."""
    s = EventScorer(t_collar=0.2)
    refs = [(0, 1.0, 2.0), (0, 1.15, 2.15)]
    # p1 at onset 1.1 matches both (|d|<=0.2); p2 at 0.85 matches only r1
    preds = [(0, 1.1, 2.05), (0, 0.85, 1.9)]
    s.add_clip(preds, refs)
    sc = s.scores()
    assert s.tp[0] == 2 and s.fp[0] == 0 and s.fn[0] == 0
    assert sc["Event_Micro_F1"] == 1.0


def test_scorer_optimal_matching_prefers_nearest_among_max():
    """Among maximum-cardinality matchings, total onset distance is
    minimized (deterministic, sensible pairing)."""
    s = EventScorer(t_collar=0.5)
    refs = [(1, 1.0, 2.0), (1, 1.4, 2.4)]
    preds = [(1, 1.05, 2.0), (1, 1.45, 2.4)]
    s.add_clip(preds, refs)
    assert s.tp[1] == 2


def test_scorer_unmatchable_still_counts():
    s = EventScorer(t_collar=0.1)
    s.add_clip([(2, 5.0, 6.0)], [(2, 1.0, 2.0)])
    assert s.tp[2] == 0 and s.fp[2] == 1 and s.fn[2] == 1


# ------------------------------------------------- GSC tie handling

def test_gsc_accuracy_exact_tie_keeps_single_argmax():
    """Two AudioSet classes exactly tied at the max; a keyword fires.
    Keeping ALL tied maxima would leave the tied copy alive after the
    argmax column is zeroed, outranking the keyword — the reference
    keeps only the single argmax (scatter into zeros)."""
    n_as = 3
    # columns: 3 AudioSet + 2 keywords
    pred = np.array([[0.9, 0.9, 0.1, 0.3, 0.0]], dtype=np.float32)
    # true label: keyword 0 (class index 3)
    target = np.zeros((1, 5), dtype=np.float32)
    target[0, 3] = 1.0
    acc = gsc_accuracy(pred, target, threshold=0.2, n_audioset=n_as)
    assert acc == 1.0  # keyword wins; the tied AudioSet copy must not


def test_gsc_accuracy_unchanged_without_ties():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (64, 537)).astype(np.float32)
    target = np.zeros((64, 537), dtype=np.float32)
    target[np.arange(64), rng.integers(0, 537, 64)] = 1.0
    a = gsc_accuracy(pred, target)
    assert 0.0 <= a <= 1.0


# ---------------------------------------------- Adam8bit substitution

class _Capture(list):
    """Minimal logging handler capturing records (the project logger does
    not propagate, so caplog can't see it)."""

    def __init__(self):
        import logging

        super().__init__()
        self.handler = logging.Handler()
        self.handler.emit = self.append


def _captured_warnings(fn):
    from uit_mobile_tpu.utils import get_logger

    cap = _Capture()
    logger = get_logger()
    logger.addHandler(cap.handler)
    try:
        fn()
    finally:
        logger.removeHandler(cap.handler)
    return [r for r in cap if r.levelname == "WARNING"]


def test_adam8bit_substitution_warns():
    from uit_mobile_tpu.train.steps import build_optimizer

    records = _captured_warnings(lambda: build_optimizer("Adam8bit", 1e-3))
    assert any("adafactor" in r.getMessage().lower() for r in records)


def test_adamw_does_not_warn():
    from uit_mobile_tpu.train.steps import build_optimizer

    records = _captured_warnings(lambda: build_optimizer("AdamW", 1e-3))
    assert not records


# ---------------------------------------------------- CLI flag parity

def test_evaluate_cli_strong_accepts_shared_flags():
    """`uit-evaluate strong CKPT --dtype int16 --batch-size 8` must parse
    (it used to error: the shared flags skipped the strong subparser)."""
    import argparse

    from uit_mobile_tpu.cli import evaluate as ev_cli

    # parse_args only — a bogus checkpoint path never reaches resolution
    parser_error = {}

    class _P(argparse.ArgumentParser):
        def error(self, message):  # pragma: no cover
            parser_error["msg"] = message
            raise SystemExit(2)

    # reuse the real main() argument wiring by monkeypatching sys.argv via
    # argv=... and intercepting before Evaluator work: strong with a
    # missing eval file raises before any model load, so catch broadly
    with pytest.raises(BaseException) as exc:
        ev_cli.main(["strong", "/nonexistent/ckpt", "--dtype", "int16",
                     "--batch-size", "8", "--eval-data", "/nonexistent.tsv"])
    # must NOT be an argparse unrecognized-arguments exit
    assert "unrecognized arguments" not in str(exc.value)


# ------------------------------------- fast+DP eval keeps the Pallas kernel

def _dp_eval_fixture(tmp_path):
    import h5py
    import pandas as pd
    import jax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ckpt.io import save_checkpoint

    rng = np.random.default_rng(5)
    h5 = tmp_path / "dp.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(8):
            f[f"c{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(np.int16)
            rows.append((f"c{i}.wav", "3", str(h5)))
    tsv = tmp_path / "dp.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)
    return ckpt, tsv


def test_fast_dp_eval_keeps_pallas_and_matches_single_device(tmp_path):
    """Evaluator(fast=True, data_parallel=True) routes the Pallas forward
    through shard_map (per-sample top_db) instead of silently dropping to
    the XLA frontend; on non-degenerate audio the scores equal the
    single-device fast run (the clamp never binds 120 dB below max)."""
    import jax

    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator

    assert jax.device_count() == 8  # conftest's CPU mesh
    ckpt, tsv = _dp_eval_fixture(tmp_path)
    df = read_tsv_data(tsv, basename=False)
    kw = dict(batch_size=8, num_workers=0, use_pallas=True, fast=True)
    p1, _ = Evaluator(str(ckpt), **kw)._run_epoch(df, num_classes=537)
    pdp, _ = Evaluator(str(ckpt), data_parallel=True,
                       **kw)._run_epoch(df, num_classes=537)
    np.testing.assert_allclose(pdp, p1, atol=1e-6)


def test_exact_dp_eval_still_uses_global_clamp(tmp_path):
    """Exact-grade DP eval keeps the XLA frontend with the batch-global
    torch clamp (bit-parity path unchanged)."""
    import jax

    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator

    ckpt, tsv = _dp_eval_fixture(tmp_path)
    df = read_tsv_data(tsv, basename=False)
    kw = dict(batch_size=8, num_workers=0)
    p1, _ = Evaluator(str(ckpt), **kw)._run_epoch(df, num_classes=537)
    pdp, _ = Evaluator(str(ckpt), data_parallel=True, use_pallas=True,
                       **kw)._run_epoch(df, num_classes=537)
    np.testing.assert_allclose(pdp, p1, atol=1e-5)


# --------------------------------------- scanned dispatch in the Evaluator

def test_scanned_eval_matches_per_batch(tmp_path):
    """Evaluator(scan_batches=K): full K-blocks run as one scanned
    dispatch, shape changes and the epoch tail flush per-batch — results
    keep loader order, cover every clip, and match scan_batches=1 to f32
    epsilon. Mixed clip lengths exercise the shape-change flush."""
    import h5py
    import jax
    import pandas as pd

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator

    rng = np.random.default_rng(11)
    h5 = tmp_path / "scan.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        # 4 full-length + 3 half-length clips: batches of 2 give two
        # 16000-sample batches (one scan block at K=2), then a shape
        # change, one 8000 block, and a size-1 tail
        for i, n in enumerate([16000] * 4 + [8000] * 3):
            f[f"c{i}.wav"] = (rng.standard_normal(n) * 3000).astype(np.int16)
            rows.append((f"c{i}.wav", str(i % 5), str(h5)))
    tsv = tmp_path / "scan.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)

    df = read_tsv_data(tsv, basename=False)
    kw = dict(batch_size=2, num_workers=0, fast=True, use_pallas=True)
    p1, t1 = Evaluator(str(ckpt), **kw)._run_epoch(df, num_classes=537)
    pk, tk = Evaluator(str(ckpt), scan_batches=2, **kw)._run_epoch(
        df, num_classes=537)
    assert p1.shape == pk.shape == (7, 537)
    np.testing.assert_array_equal(t1, tk)  # loader order preserved
    np.testing.assert_allclose(pk, p1, atol=1e-6)


def test_scanned_eval_cli_flag_parses():
    from uit_mobile_tpu.cli import evaluate as ev_cli

    with pytest.raises(BaseException) as exc:
        ev_cli.main(["gsc", "/nonexistent/ckpt", "--scan", "4",
                     "--eval-data", "/nonexistent.tsv"])
    assert "unrecognized arguments" not in str(exc.value)
