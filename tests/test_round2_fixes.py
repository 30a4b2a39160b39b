"""Regression tests for round-2 review items: loss registry honoring
loss_args, a working ErrorRate metric, checkpoint-dir resolution by score,
and the config-driven basename flag in KWS evaluation."""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.train.steps import make_loss, bce_loss


# ---------------------------------------------------------------- losses

def test_make_loss_bce_default_matches_plain_bce():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, (4, 7)).astype(np.float32)
    t = (rng.uniform(size=(4, 7)) > 0.5).astype(np.float32)
    got = float(make_loss("BCELoss")(jnp.asarray(p), jnp.asarray(t)))
    want = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    assert abs(got - want) < 1e-6


def test_make_loss_bce_weight_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    p = rng.uniform(0.01, 0.99, (5, 6)).astype(np.float32)
    t = (rng.uniform(size=(5, 6)) > 0.5).astype(np.float32)
    w = rng.uniform(0.2, 2.0, (6,)).astype(np.float32)
    got = float(make_loss("BCELoss", weight=w)(jnp.asarray(p), jnp.asarray(t)))
    want = float(
        torch.nn.BCELoss(weight=torch.from_numpy(w))(
            torch.from_numpy(p), torch.from_numpy(t)
        )
    )
    assert abs(got - want) < 1e-5


def test_make_loss_ce_weight_matches_torch():
    """Our CE on probability outputs == torch CE fed log-probs as logits."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    p = rng.uniform(0.01, 0.99, (8, 5)).astype(np.float32)
    idx = rng.integers(0, 5, size=8)
    onehot = np.eye(5, dtype=np.float32)[idx]
    w = rng.uniform(0.2, 2.0, (5,)).astype(np.float32)
    got = float(
        make_loss("CrossEntropyLoss", weight=w)(jnp.asarray(p), jnp.asarray(onehot))
    )
    want = float(
        torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
            torch.from_numpy(np.log(p)), torch.from_numpy(idx)
        )
    )
    assert abs(got - want) < 1e-5


def test_make_loss_ce_label_smoothing_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    p = rng.uniform(0.01, 0.99, (8, 5)).astype(np.float32)
    idx = rng.integers(0, 5, size=8)
    onehot = np.eye(5, dtype=np.float32)[idx]
    got = float(
        make_loss("CrossEntropyLoss", label_smoothing=0.1)(
            jnp.asarray(p), jnp.asarray(onehot)
        )
    )
    want = float(
        torch.nn.CrossEntropyLoss(label_smoothing=0.1)(
            torch.from_numpy(np.log(p)), torch.from_numpy(idx)
        )
    )
    assert abs(got - want) < 1e-5


def test_make_loss_focal_gamma0_is_bce():
    rng = np.random.default_rng(4)
    p = rng.uniform(0.01, 0.99, (4, 7)).astype(np.float32)
    t = (rng.uniform(size=(4, 7)) > 0.5).astype(np.float32)
    focal = float(make_loss("FocalLoss", gamma=0.0)(jnp.asarray(p), jnp.asarray(t)))
    want = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    assert abs(focal - want) < 1e-6
    # gamma>0 down-weights easy examples -> smaller loss on confident preds
    conf_p = np.where(t > 0, 0.95, 0.05).astype(np.float32)
    hi = float(make_loss("FocalLoss", gamma=2.0)(jnp.asarray(conf_p), jnp.asarray(t)))
    lo = float(bce_loss(jnp.asarray(conf_p), jnp.asarray(t)))
    assert hi < lo


def test_make_loss_unknown_raises():
    with pytest.raises(KeyError, match="BCEWithLogits|unknown"):
        make_loss("BCEWithLogitsLoss")


def test_train_step_honors_loss_args():
    """loss_args flows into the jitted step: zero class weights -> zero loss."""
    from uit_mobile_tpu.train.steps import build_optimizer, make_train_step

    cfg = models.get_model_config("uit_xxxs", outputdim=4, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    opt = build_optimizer("Adam", 1e-3)
    opt_state = opt.init(params)
    batch = {
        "wav": jnp.zeros((2, 16000), jnp.float32),
        "target": jnp.ones((2, 4), jnp.float32),
    }
    step = make_train_step(cfg, opt, loss_name="BCELoss",
                           loss_args={"weight": np.zeros(4, np.float32)})
    *_, metrics = step(params, state, opt_state, batch, jax.random.key(1))
    assert float(metrics["total_loss"]) == 0.0


# ------------------------------------------------------------- ErrorRate

def test_error_rate_single_label_argmax():
    from uit_mobile_tpu.evaluate.metrics import compute_metrics

    probs = np.array([[0.9, 0.05, 0.05], [0.2, 0.7, 0.1], [0.1, 0.8, 0.1],
                      [0.3, 0.3, 0.4]], np.float32)
    onehot = np.eye(3, dtype=np.float32)[[0, 1, 2, 2]]  # 3rd row wrong
    out = compute_metrics(["ErrorRate"], probs, onehot)
    assert out["ErrorRate"] == pytest.approx(0.25)


def test_error_rate_multilabel_probabilities_do_not_crash():
    """The reference's version raises on any real multilabel eval batch
    (sklearn rejects continuous multilabel preds); ours must work."""
    from uit_mobile_tpu.evaluate.metrics import compute_metrics

    rng = np.random.default_rng(0)
    probs = rng.uniform(size=(16, 537)).astype(np.float32)
    targets = (rng.uniform(size=(16, 537)) > 0.98).astype(np.float32)
    out = compute_metrics(["ErrorRate"], probs, targets)
    assert 0.0 <= out["ErrorRate"] <= 1.0


def test_error_rate_index_targets():
    from uit_mobile_tpu.evaluate.metrics import error_rate

    probs = np.array([[0.9, 0.1], [0.4, 0.6]], np.float32)
    assert error_rate(probs, np.array([0, 1])) == pytest.approx(0.0)
    assert error_rate(probs, np.array([1, 1])) == pytest.approx(0.5)


# -------------------------------------------------- checkpoint resolution

def test_dir_resolution_prefers_highest_score_not_lexicographic(tmp_path):
    from uit_mobile_tpu.cli.common import _pick_checkpoint_in_dir
    from uit_mobile_tpu.ckpt.io import save_checkpoint

    cfg = models.get_model_config("uit_xxxs", outputdim=4, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    # lexicographically, "best_model_10..." sorts before "best_model_2..."
    save_checkpoint(tmp_path / "best_model_10_mAP=0.2000.npz", params, state, cfg)
    save_checkpoint(tmp_path / "best_model_2_mAP=0.9000.npz", params, state, cfg)
    assert _pick_checkpoint_in_dir(tmp_path).name == "best_model_2_mAP=0.9000.npz"
    # the averaged deliverable wins over any best_*
    save_checkpoint(tmp_path / "averaged.npz", params, state, cfg)
    assert _pick_checkpoint_in_dir(tmp_path).name == "averaged.npz"


# --------------------------------------------------------- basename flag

def _write_kws_fixture(tmp_path, filenames_in_manifest):
    """HDF5 keyed by BASENAME + manifest rows with the given filenames."""
    import h5py

    rng = np.random.default_rng(0)
    h5 = tmp_path / "kws.h5"
    with h5py.File(h5, "w") as f:
        for name in ("a.wav", "b.wav"):
            f[name] = (rng.standard_normal(16000) * 3000).astype(np.int16)
    tsv = tmp_path / "kws.tsv"
    rows = [(fn, "530", str(h5)) for fn in filenames_in_manifest]
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    return tsv


def test_kws_eval_honors_checkpoint_basename_flag(tmp_path):
    """Evaluator._kws must read `basename` from the checkpoint's training
    config (reference evaluate.py:200-201), not hardcode False."""
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.evaluate import Evaluator

    # manifest rows carry directory prefixes; the h5 is keyed by basename,
    # so only basename=True evaluation can resolve the clips
    tsv = _write_kws_fixture(tmp_path, ["sub/a.wav", "deep/dir/b.wav"])
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))

    ckpt_with = tmp_path / "with_basename.npz"
    save_checkpoint(ckpt_with, params, state, cfg,
                    extra={"run_config": {"basename": True}})
    ev = Evaluator(batch_size=2, num_workers=0, report_dir=str(tmp_path))
    res = ev._kws(str(ckpt_with), str(tsv))
    assert "Accuracy@0.2" in res

    ckpt_without = tmp_path / "no_config.npz"
    save_checkpoint(ckpt_without, params, state, cfg)
    ev2 = Evaluator(batch_size=2, num_workers=0, report_dir=str(tmp_path))
    with pytest.raises((KeyError, RuntimeError, Exception)):
        ev2._kws(str(ckpt_without), str(tsv))


# --------------------------------------------------------- threshold sweep

def test_kws_threshold_sweep_monotonic_tradeoff():
    from uit_mobile_tpu.evaluate.metrics import kws_threshold_sweep

    rng = np.random.default_rng(0)
    n, n_as = 200, 527
    # half keyword clips with strong keyword scores, half filler
    y = np.zeros((n, 537), np.float32)
    probs = rng.uniform(0, 0.15, (n, 537)).astype(np.float32)
    for i in range(n):
        if i % 2 == 0:
            k = 527 + (i % 10)
            y[i, k] = 1.0
            probs[i, k] = rng.uniform(0.3, 0.95)
        else:
            y[i, rng.integers(0, n_as)] = 1.0
    curve = kws_threshold_sweep(probs, y)
    ts = sorted(curve)
    assert ts == sorted(set(ts)) and len(ts) >= 5
    far = [curve[t]["filler_false_accept_rate"] for t in ts]
    frr = [curve[t]["macro_false_reject_rate"] for t in ts]
    # raising the threshold can only reduce false accepts and raise rejects
    assert all(a >= b - 1e-9 for a, b in zip(far, far[1:]))
    assert all(a <= b + 1e-9 for a, b in zip(frr, frr[1:]))
    assert all(0.0 <= curve[t]["Accuracy"] <= 1.0 for t in ts)


def test_evaluator_gsc_sweep_flag(tmp_path):
    from uit_mobile_tpu.data import read_tsv_data  # noqa: F401
    from uit_mobile_tpu.evaluate import Evaluator

    ckpt, tsv = _eval_fixture(tmp_path)
    ev = Evaluator(batch_size=4, num_workers=0, report_dir=str(tmp_path))
    res = ev._kws(str(ckpt), str(tsv), sweep=True)
    assert "_sweep" in res and 0.2 in res["_sweep"]


# ------------------------------------------------- evaluator fast / DP modes

def _eval_fixture(tmp_path):
    import h5py

    from uit_mobile_tpu.ckpt.io import save_checkpoint

    rng = np.random.default_rng(0)
    h5 = tmp_path / "e.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(5):  # 5 clips: not a multiple of the 8-device mesh
            f[f"c{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(np.int16)
            rows.append((f"c{i}.wav", "530", str(h5)))
    tsv = tmp_path / "e.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)
    return ckpt, tsv


def test_evaluator_data_parallel_matches_single_device(tmp_path):
    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator

    ckpt, tsv = _eval_fixture(tmp_path)
    df = read_tsv_data(tsv, basename=False)
    base = Evaluator(str(ckpt), batch_size=5, num_workers=0)
    dp = Evaluator(str(ckpt), batch_size=5, num_workers=0, data_parallel=True)
    pa, _ = base._run_epoch(df, num_classes=537)
    pb, _ = dp._run_epoch(df, num_classes=537)  # 5 rows -> padded to 8, sliced
    assert pa.shape == pb.shape == (5, 537)
    np.testing.assert_allclose(pa, pb, atol=1e-6)


def test_evaluator_fast_mode_stays_inside_budget(tmp_path):
    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator

    ckpt, tsv = _eval_fixture(tmp_path)
    df = read_tsv_data(tsv, basename=False)
    exact = Evaluator(str(ckpt), batch_size=5, num_workers=0)
    # fast on CPU still exercises the precision knob (btf needs pallas)
    fast = Evaluator(str(ckpt), batch_size=5, num_workers=0, fast=True,
                     use_pallas=True)
    pa, _ = exact._run_epoch(df, num_classes=537)
    pb, _ = fast._run_epoch(df, num_classes=537)
    assert np.abs(pa - pb).max() < 1e-3


# ---------------------------------------------- bucketed trainer validation

def test_trainer_validate_buckets_shapes(tmp_path):
    """A mixed-length eval set must reach the jitted eval step with a
    BOUNDED set of shapes (one per occupied second-bucket), not one shape
    per distinct batch-max length."""
    from uit_mobile_tpu.train.loop import Trainer

    config = {
        "outputpath": str(tmp_path),
        "model": "uit_xxxs",
        "batch_size": 4,
    }
    tr = Trainer(config)

    rng = np.random.default_rng(0)
    seen_shapes = []

    def fake_eval_step(params, state, wav):
        seen_shapes.append(tuple(np.shape(wav)))
        return np.asarray(rng.uniform(size=(np.shape(wav)[0], 10)), np.float32)

    # batch-max lengths: 15500, 16000, 24000, 47997 -> 4 distinct raw
    # shapes, but only 3 occupied second-buckets (1s, 2s, 3s)
    loader = []
    for L in (15500, 16000, 24000, 47997):
        t = (rng.uniform(size=(2, 10)) > 0.5).astype(np.float32)
        loader.append({"wav": np.zeros((2, L), np.float32), "target": t})

    score = tr._validate(fake_eval_step, None, None, loader, epoch=1)
    assert np.isfinite(score)
    assert all(s[-1] % 16000 == 0 for s in seen_shapes), seen_shapes
    assert len(set(seen_shapes)) == 3, seen_shapes

    # opting out (valid_bucket_seconds: None) restores exact batch-max shapes
    seen_shapes.clear()
    tr.config["valid_bucket_seconds"] = None
    tr._validate(fake_eval_step, None, None, loader, epoch=2)
    assert len(set(seen_shapes)) == 4, seen_shapes


def test_make_loss_ce_weight_plus_smoothing_matches_torch():
    """weight AND label_smoothing together: torch divides by sum(w[y_n])
    with smoothing kept OUT of the denominator (regression: the smoothed
    target mass leaked in, silently rescaling the loss)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    p = rng.uniform(0.01, 0.99, (8, 5)).astype(np.float32)
    idx = rng.integers(0, 5, size=8)
    onehot = np.eye(5, dtype=np.float32)[idx]
    w = rng.uniform(0.2, 2.0, (5,)).astype(np.float32)
    got = float(
        make_loss("CrossEntropyLoss", weight=w, label_smoothing=0.1)(
            jnp.asarray(p), jnp.asarray(onehot)
        )
    )
    want = float(
        torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w),
                                  label_smoothing=0.1)(
            torch.from_numpy(np.log(p)), torch.from_numpy(idx)
        )
    )
    assert abs(got - want) < 1e-5
