"""Calibration (evaluate.calibration): ECE, reliability, temperature
scaling, the deployable JSON round trip, and the serving integration.

The reference ships raw sigmoid outputs with no calibration machinery;
these tests pin the framework extension's math on constructed cases
where the right answers are known in closed form.
"""

import json

import numpy as np
import pytest

from uit_mobile_tpu.evaluate.calibration import (
    apply_temperature,
    ece,
    fit_temperature,
    load_calibration,
    reliability,
    save_calibration,
)


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


class TestReliabilityAndECE:
    def test_perfectly_calibrated_is_zero(self):
        # cells predicted p are positive with probability exactly p
        rng = np.random.default_rng(0)
        p = rng.uniform(0.0, 1.0, size=(4000, 10))
        t = (rng.uniform(size=p.shape) < p).astype(np.float32)
        assert ece(p, t, n_bins=10) < 0.02  # sampling noise only

    def test_maximally_miscalibrated(self):
        # confident and always wrong: ECE -> ~1
        p = np.full((100, 5), 0.999)
        t = np.zeros((100, 5))
        assert ece(p, t) > 0.98

    def test_reliability_bins(self):
        p = np.array([[0.05, 0.95, 0.95, 0.55]])
        t = np.array([[0.0, 1.0, 0.0, 1.0]])
        rel = reliability(p, t, n_bins=10)
        assert rel["count"].sum() == 4
        assert rel["count"][0] == 1 and rel["count"][9] == 2
        assert rel["accuracy"][9] == pytest.approx(0.5)
        assert rel["confidence"][9] == pytest.approx(0.95)
        assert np.isnan(rel["confidence"][3])  # empty bin

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape"):
            reliability(np.zeros((2, 3)), np.zeros((2, 4)))

    def test_boundary_cells_bin_safely(self):
        # p exactly 0 and 1 must land in the first/last bin, not crash
        assert ece(np.array([[0.0, 1.0]]), np.array([[0.0, 1.0]])) == \
            pytest.approx(0.0)


class TestFitTemperature:
    def test_recovers_known_temperature(self):
        # targets drawn from sigmoid(z); observed probs are sigmoid(z * 2)
        # (overconfident by exactly T=2) -> the fit must find T ~= 2
        rng = np.random.default_rng(1)
        z = rng.normal(0.0, 2.0, size=(20000, 1))
        t = (rng.uniform(size=z.shape) < _sigmoid(z)).astype(np.float64)
        p_over = _sigmoid(z * 2.0)
        T = fit_temperature(p_over, t)
        assert 1.8 < T < 2.2
        # and calibrating with it improves ECE
        assert ece(apply_temperature(p_over, T), t) < ece(p_over, t)

    def test_calibrated_input_fits_T_near_one(self):
        rng = np.random.default_rng(2)
        z = rng.normal(0.0, 2.0, size=(20000, 1))
        t = (rng.uniform(size=z.shape) < _sigmoid(z)).astype(np.float64)
        T = fit_temperature(_sigmoid(z), t)
        assert 0.9 < T < 1.1

    def test_per_class_vector(self):
        rng = np.random.default_rng(3)
        z = rng.normal(0.0, 2.0, size=(20000, 3))
        t = (rng.uniform(size=z.shape) < _sigmoid(z)).astype(np.float64)
        # class 0 overconfident (T=2), class 1 calibrated, class 2 has no
        # positives at all -> T pinned to 1.0 by the degenerate guard
        p = np.stack([_sigmoid(z[:, 0] * 2.0), _sigmoid(z[:, 1]),
                      _sigmoid(z[:, 2])], axis=1)
        t[:, 2] = 0.0
        T = fit_temperature(p, t, per_class=True)
        assert T.shape == (3,)
        assert 1.7 < T[0] < 2.3
        assert 0.85 < T[1] < 1.15
        assert T[2] == 1.0

    def test_no_positives_anywhere_returns_identity(self):
        p = np.full((50, 4), 0.3)
        t = np.zeros((50, 4))
        assert fit_temperature(p, t) == 1.0
        assert np.all(fit_temperature(p, t, per_class=True) == 1.0)

    def test_bad_shapes_raise(self):
        with pytest.raises(ValueError, match="matching"):
            fit_temperature(np.zeros((4, 3)), np.zeros((4, 2)))


class TestApplyTemperature:
    def test_identity_at_T1(self):
        p = np.array([[0.1, 0.5, 0.9]])
        np.testing.assert_allclose(apply_temperature(p, 1.0), p, atol=1e-6)

    def test_warming_softens(self):
        p = np.array([[0.9, 0.1]])
        warm = apply_temperature(p, 2.0)
        assert warm[0, 0] < 0.9 and warm[0, 1] > 0.1  # both move toward 0.5

    def test_vector_broadcast(self):
        p = np.array([[0.9, 0.9]])
        out = apply_temperature(p, np.array([1.0, 2.0]))
        assert out[0, 0] == pytest.approx(0.9, abs=1e-6)
        assert out[0, 1] < 0.9

    def test_nonpositive_T_rejected(self):
        with pytest.raises(ValueError, match="positive"):
            apply_temperature(np.array([[0.5]]), 0.0)


class TestCalibrationFile:
    def test_scalar_roundtrip(self, tmp_path):
        path = save_calibration(tmp_path / "cal.json", 1.7,
                                meta={"eval_data": "x.tsv"})
        assert load_calibration(path) == pytest.approx(1.7)
        assert json.loads(path.read_text())["eval_data"] == "x.tsv"

    def test_vector_roundtrip(self, tmp_path):
        T = np.array([1.0, 2.0, 0.5])
        path = save_calibration(tmp_path / "cal.json", T)
        np.testing.assert_allclose(load_calibration(path), T)

    def test_bad_file_rejected(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps({"temperature": -1.0}))
        with pytest.raises(ValueError):
            load_calibration(p)
        p.write_text(json.dumps({"temperature": [1.0, 0.0]}))
        with pytest.raises(ValueError):
            load_calibration(p)


class TestRegistryIntegration:
    def test_ece_metric_in_registry(self):
        from uit_mobile_tpu.evaluate.metrics import compute_metrics

        p = np.full((10, 4), 0.999)
        t = np.zeros((10, 4))
        out = compute_metrics(["ECE"], p, t)
        assert out["ECE"] > 0.98


class TestServiceIntegration:
    def test_service_applies_calibration(self, tiny_model, tmp_path):
        """TaggingService(calibration=...) must return temperature-scaled
        probs: compare against an uncalibrated service on the same wav."""
        from uit_mobile_tpu.serve import ServiceConfig, TaggingService

        cfg, params, state = tiny_model
        sc = ServiceConfig(batch_size=4, max_seconds=1, warmup=False)
        wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1

        with TaggingService(cfg, params, state, sc) as plain:
            base = plain.submit(wav).result(timeout=60)

        cal_path = save_calibration(tmp_path / "cal.json", 2.0)
        with TaggingService(cfg, params, state, sc,
                            calibration=cal_path) as svc:
            probs = svc.submit(wav).result(timeout=60)
        np.testing.assert_allclose(probs, apply_temperature(base[None], 2.0)[0],
                                   atol=1e-5)


class TestEvaluatorCalibrate:
    def test_end_to_end_fit_and_file(self, tmp_path):
        """Evaluator.calibrate: one inference epoch over a synthetic HDF5
        manifest -> temperature + ECE report + deployable JSON."""
        import h5py
        import jax
        import pandas as pd

        from uit_mobile_tpu import models
        from uit_mobile_tpu.ckpt.io import save_checkpoint
        from uit_mobile_tpu.evaluate import Evaluator

        rng = np.random.default_rng(7)
        h5 = tmp_path / "cal.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(8):
                f[f"c{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(np.int16)
                rows.append((f"c{i}.wav", str(i % 4), str(h5)))
        tsv = tmp_path / "cal.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
            tsv, sep="\t", index=False)
        cfg = models.get_model_config("uit_xxxs", outputdim=10,
                                      target_length=102, depth=1)
        params, state = models.build(cfg, jax.random.key(0))
        ckpt = tmp_path / "m.npz"
        save_checkpoint(ckpt, params, state, cfg)

        out = tmp_path / "calibration.json"
        res = Evaluator(str(ckpt), batch_size=8, num_workers=0).calibrate(
            eval_data=str(tsv), num_classes=10, out=out)
        assert res["n_clips"] == 8
        assert 0.05 <= res["temperature"] <= 20.0
        assert res["BCE_after"] <= res["BCE_before"] + 1e-9
        T = load_calibration(out)
        assert T == pytest.approx(res["temperature"])


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from uit_mobile_tpu import models

    cfg = models.get_model_config("uit_xxxs", outputdim=10, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state
