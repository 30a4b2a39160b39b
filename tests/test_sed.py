"""SED (strong-label framewise) training: targets, forward, learning.

Beyond the reference: it never trains on strong labels (its chunked
dataset is dead code and the dm head's per-timestep probabilities are
always averaged away, reference uit.py:405-412)."""

import numpy as np
import pandas as pd
import pytest
import h5py
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.data import StrongFramewiseHDF5Dataset, read_tsv_data

SR = 16000


def _cfg(**kw):
    return models.get_model_config("uit_xxxs", outputdim=10, target_length=102,
                                   depth=1, pooling="dm", **kw)


@pytest.fixture()
def sed_env(tmp_path):
    """Events = bursts of a class-specific tone in the first or second half
    of each 1 s clip; silence elsewhere. Learnable localization."""
    rng = np.random.default_rng(0)
    h5 = tmp_path / "sed.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(24):
            cls = i % 2            # class 0 or 1
            half = (i // 2) % 2    # event in first or second half
            clip = (rng.standard_normal(SR) * 120).astype(np.int16)  # noise floor
            t = np.arange(SR // 2) / SR
            tone = np.sin(2 * np.pi * (600 + 2400 * cls) * t) * 12000
            lo = half * (SR // 2)
            clip[lo:lo + SR // 2] += tone.astype(np.int16)
            f[f"c_{i}.wav"] = clip
            rows.append((f"c_{i}.wav", str(cls), str(h5),
                         lo / SR, (lo + SR // 2) / SR))
    tsv = tmp_path / "sed.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path",
                                "from", "to"]).to_csv(tsv, sep="\t", index=False)
    return tsv


def test_framewise_head_mean_matches_clip_head():
    cfg = _cfg()
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((2, SR)).astype(np.float32) * 0.1)
    clip = models.apply(cfg, params, state, wav)
    fw, _ = models.uit.forward_framewise(cfg, params, state, wav)
    np.testing.assert_allclose(np.asarray(fw.mean(axis=1)), np.asarray(clip),
                               atol=1e-6)


def test_strong_framewise_dataset_targets(sed_env):
    import random

    df = read_tsv_data(sed_env, basename=False)
    ds = StrongFramewiseHDF5Dataset(df, num_classes=10, n_segments=6,
                                    seg_seconds=0.16, chunk_length=1.0,
                                    rng=random.Random(0))
    assert len(ds) == 24  # one item per FILE
    wav, target, fname = ds[0]  # c_0: class 0, event in [0, 0.5)s
    assert wav.shape == (SR,) and target.shape == (6, 10)
    # clip is exactly 1 s -> window at 0: first ~3 segments positive
    assert target[:3, 0].all() and not target[4:, 0].any()
    assert target[:, 1:].sum() == 0


def test_deterministic_windows_are_index_pure(tmp_path):
    """deterministic=True: the window offset depends only on the index, not
    on read order — validation epochs score identical windows."""
    import random

    h5 = tmp_path / "d.h5"
    rng = np.random.default_rng(4)
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(4):
            f[f"c_{i}.wav"] = rng.integers(-300, 300, 3 * SR, np.int16)
            rows.append((f"c_{i}.wav", "1", str(h5), 0.5, 2.5))
    tsv = tmp_path / "d.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path",
                                "from", "to"]).to_csv(tsv, sep="\t", index=False)
    df = read_tsv_data(tsv, basename=False)
    kw = dict(num_classes=10, n_segments=6, seg_seconds=0.16,
              chunk_length=1.0, deterministic=True)
    a = StrongFramewiseHDF5Dataset(df, rng=random.Random(1), **kw)
    b = StrongFramewiseHDF5Dataset(df, rng=random.Random(2), **kw)
    for order in ([0, 1, 2, 3], [3, 1, 0, 2]):
        for i in order:
            wa, ta, _ = a[i]
            wb, tb, _ = b[i]
            np.testing.assert_array_equal(wa, wb)
            np.testing.assert_array_equal(ta, tb)


def test_framewise_times_matches_forward_framewise():
    cfg = _cfg()
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    for seconds in (1, 3):
        wav = jnp.asarray(rng.standard_normal((1, seconds * SR)).astype(np.float32))
        probs, times = models.uit.forward_framewise(cfg, params, state, wav)
        host = models.uit.framewise_times(cfg, seconds * SR // 160 + 1)
        assert times.dtype == np.float64
        np.testing.assert_array_equal(times, host)
        assert probs.shape[1] == times.shape[0]


def test_framewise_train_step_runs_and_shapes(sed_env):
    import optax
    from uit_mobile_tpu.train.steps import make_framewise_train_step

    cfg = _cfg()
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adam(1e-3)
    step = make_framewise_train_step(cfg, opt, max_grad_norm=1.0)
    rng = np.random.default_rng(2)
    batch = {
        "wav": jnp.asarray(rng.integers(-20000, 20000, (4, SR), np.int16)),
        "target": jnp.asarray((rng.random((4, 6, 10)) < 0.2).astype(np.float32)),
    }
    p, s, o, m = step(params, state, opt.init(params), batch, jax.random.key(1))
    assert np.isfinite(float(m["total_loss"])) and float(m["grad_norm"]) > 0


def test_sed_training_learns_localization(tmp_path, sed_env):
    from uit_mobile_tpu.train.sed import train_sed_from_config
    from uit_mobile_tpu.ckpt.io import load_checkpoint

    out = train_sed_from_config(dict(
        outputpath=str(tmp_path / "exp"), model="uit_xxxs", num_classes=10,
        # init_bn=False (GlobalNormer): inference-BN running stats need
        # hundreds of momentum-0.01 steps to converge — too slow for a smoke
        model_args={"target_length": 102, "depth": 1, "init_bn": False},
        strong_train_data=str(sed_env), basename=False,
        batch_size=8, epochs=8, epoch_length=6, warmup_iters=3,
        optimizer="AdamW", optimizer_args={"lr": 2e-3}, num_workers=0,
        seed=0, config_stem="sed-smoke", threshold=0.3,
    ))
    assert out.exists()
    params, state, cfg, extra = load_checkpoint(out)
    assert extra["segment_f1_micro"] > 0.55, extra  # way above chance (~0.1)

    # localization: event half scores higher than silent half for its class
    df = read_tsv_data(sed_env, basename=False)
    import random
    ds = StrongFramewiseHDF5Dataset(df, num_classes=10, n_segments=6,
                                    seg_seconds=0.16, chunk_length=1.0,
                                    rng=random.Random(7))
    hits = total = 0
    for i in range(len(ds)):
        wav, target, _ = ds[i]
        fw, _ = models.uit.forward_framewise(
            cfg, params, state, jnp.asarray(wav[None]))
        fw = np.asarray(fw)[0]  # (6, 10)
        for cls in range(10):
            on = target[:, cls] > 0
            if on.any() and (~on).any():
                total += 1
                hits += fw[on, cls].mean() > fw[~on, cls].mean()
    assert total > 0 and hits / total > 0.7, (hits, total)

    # SED round trip: the strong evaluation target scores the checkpoint
    # against the event manifest (full-clip framewise path)
    from uit_mobile_tpu.evaluate import Evaluator

    dump = tmp_path / "events_pred.tsv"
    res = Evaluator(str(out), num_workers=0,
                    report_dir=str(tmp_path)).strong(
        eval_data=str(sed_env), threshold=0.3, median_kernel=3,
        event_collar=0.25, dump_events=str(dump),
        sweep=(0.2, 0.3, 0.6), psds={"alpha_ct": 0.5},
        thresholds_out=str(tmp_path / "op.json"))
    assert res["Segment_Micro_F1"] > 0.5, res
    # PSDS rides on the same sweep (intersection criterion); bounded
    assert 0.0 <= res["PSDS"] <= 1.0
    assert res["_psd_roc"] and res["_per_class_auc"]
    # event-level scores ride along (validity, not quality: the smoke
    # model's onsets need not survive the collar)
    assert {"Event_Micro_F1", "Event_Macro_F1", "Event_Micro_Precision",
            "Event_Micro_Recall"} <= set(res)
    assert all(0.0 <= res[k] <= 1.0 for k in res if k.startswith("Event_"))
    # the operating curve covers every requested threshold with sane rows
    curve = res["_event_operating_curve"]
    assert set(curve) == {0.2, 0.3, 0.6}
    for row in curve.values():
        assert 0.0 <= row["Event_Micro_F1"] <= 1.0
        assert 0.0 <= row["Segment_Micro_F1"] <= 1.0
    # the main scores equal the curve's row at the same settings
    assert curve[0.3]["Event_Micro_F1"] == pytest.approx(res["Event_Micro_F1"])
    assert curve[0.3]["Segment_Micro_F1"] == pytest.approx(res["Segment_Micro_F1"])
    # the sweep also names the best operating thresholds
    assert res["_best_event_threshold"] in curve
    assert res["_best_segment_threshold"] in curve
    # ... including per-class picks (every value is a sweep threshold)
    per_cls = res["_best_event_threshold_per_class"]
    assert per_cls and all(t in curve for t in per_cls.values())
    # per-class-tuned operating point rides the same sweep
    assert 0.0 <= res["Event_Micro_F1_per_class_tuned"] <= 1.0
    # thresholds_out round-trips through the deploy-side loader as the
    # mapping form every threshold= parameter accepts
    from uit_mobile_tpu.evaluate import load_thresholds

    spec = load_thresholds(tmp_path / "op.json")
    assert spec.pop("default") == res["_best_event_threshold"]
    assert spec == per_cls
    assert curve[res["_best_segment_threshold"]]["Segment_Micro_F1"] == max(
        row["Segment_Micro_F1"] for row in curve.values())
    # the dump is a well-formed TSV of the extracted events
    df_ev = pd.read_csv(dump, sep="\t")
    assert list(df_ev.columns) == ["filename", "event", "onset", "offset"]
    if len(df_ev):
        assert (df_ev["offset"] > df_ev["onset"]).all()
        assert df_ev["event"].between(0, 9).all()


def test_sed_auto_resume_restarts_from_snapshot(tmp_path, sed_env, monkeypatch):
    """auto_resume: a crash in the epoch-2 validation restarts from the
    epoch-1 last.npz in the SAME run directory and completes."""
    from uit_mobile_tpu.train import sed as sed_mod

    real_f1 = sed_mod.segment_f1
    calls = {"n": 0}

    def flaky_f1(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash")
        return real_f1(*a, **kw)

    monkeypatch.setattr(sed_mod, "segment_f1", flaky_f1)
    out = sed_mod.train_sed_from_config(dict(
        outputpath=str(tmp_path / "exp"), model="uit_xxxs", num_classes=10,
        model_args={"target_length": 102, "depth": 1, "init_bn": False},
        strong_train_data=str(sed_env), basename=False,
        batch_size=8, epochs=2, epoch_length=2, warmup_iters=1,
        optimizer="AdamW", optimizer_args={"lr": 2e-3}, num_workers=0,
        seed=0, config_stem="sed-resume", auto_resume=1,
    ))
    assert out.exists()
    assert calls["n"] >= 3  # crashed once, resumed, finished
    runs = list((tmp_path / "exp" / "sed-resume" / "uit_xxxs").iterdir())
    assert len(runs) == 1 and (runs[0] / "last.npz").exists()
