"""Regression tests for the round-4 review items (VERDICT weak #4/#5 +
ADVICE): the GSC tie_mode flag, the Evaluator dispatch-depth knob,
calibration on EVERY serving surface (/events, /stream, not just /tag),
ensemble-spec export routing, and the calibrate head-width default."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.evaluate.metrics import gsc_accuracy

# ---------------------------------------------------- GSC tie handling


class TestGscTieMode:
    def _tied_case(self):
        """One sample: AudioSet cols 1 and 3 exactly tied at 0.9, keyword
        530 fires at 0.5. True label is col 3 (filler).

        reference semantics (evaluate.py:214-219): BOTH tied columns
        survive the equality mask; step 3 zeros only the argmax (col 1),
        so col 3 still beats the keyword -> target rewritten to argmax
        (col 1) -> prediction col 3 -> WRONG (0.0 accuracy).
        'first' semantics: only col 1 survives, gets zeroed by the fired
        keyword -> prediction = keyword 530 -> also wrong vs rewritten
        target col 1 -> same accuracy here, so use a keyword target to
        split the modes instead.
        """
        y_pred = np.zeros((1, 537), np.float32)
        y_pred[0, 1] = 0.9
        y_pred[0, 3] = 0.9  # exact tie with col 1
        y_pred[0, 530] = 0.5  # keyword fired (>= 0.2)
        y_true = np.zeros((1, 537), np.float32)
        y_true[0, 530] = 1.0  # true label IS the keyword
        return y_pred, y_true

    def test_modes_diverge_on_exact_tie_with_keyword(self):
        y_pred, y_true = self._tied_case()
        # 'first': the sole surviving AudioSet col (1) is zeroed because a
        # keyword fired -> prediction = keyword -> correct
        assert gsc_accuracy(y_pred, y_true, tie_mode="first") == 1.0
        # 'reference': col 3 survives the equality mask untouched (only
        # the argmax col 1 is zeroed) and outscores the keyword -> wrong
        assert gsc_accuracy(y_pred, y_true, tie_mode="reference") == 0.0

    def test_modes_agree_without_ties(self):
        rng = np.random.default_rng(0)
        y_pred = rng.uniform(0.001, 0.999, (64, 537)).astype(np.float32)
        y_true = np.zeros((64, 537), np.float32)
        y_true[np.arange(64), rng.integers(0, 537, 64)] = 1.0
        a = gsc_accuracy(y_pred, y_true, tie_mode="first")
        b = gsc_accuracy(y_pred, y_true, tie_mode="reference")
        assert a == b

    def test_rejects_unknown_mode(self):
        y_pred, y_true = self._tied_case()
        with pytest.raises(AssertionError):
            gsc_accuracy(y_pred, y_true, tie_mode="both")

    def test_cli_flag_plumbed(self):
        """uit-evaluate gsc --tie-mode reference parses and reaches
        gsc_accuracy (harness kwarg chain, no model run)."""
        import inspect

        from uit_mobile_tpu.evaluate.harness import Evaluator

        sig = inspect.signature(Evaluator.gsc)
        assert "tie_mode" in sig.parameters
        assert sig.parameters["tie_mode"].default == "first"

    def test_sweep_uses_the_same_tie_protocol(self):
        """--sweep rows must use the SAME tie protocol as the headline:
        at the tied case the curve's Accuracy@0.2 equals gsc_accuracy
        under the chosen mode, for BOTH modes."""
        from uit_mobile_tpu.evaluate.metrics import kws_threshold_sweep

        y_pred, y_true = self._tied_case()
        for mode in ("first", "reference"):
            curve = kws_threshold_sweep(y_pred, y_true, thresholds=(0.2,),
                                        tie_mode=mode)
            assert curve[0.2]["Accuracy"] == gsc_accuracy(
                y_pred, y_true, threshold=0.2, tie_mode=mode)


# ------------------------------------------------ dispatch-depth knob


def _eval_fixture(tmp_path, outputdim=12):
    import h5py
    import pandas as pd

    from uit_mobile_tpu.ckpt.io import save_checkpoint

    rng = np.random.default_rng(7)
    h5 = tmp_path / "d.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(10):
            f[f"c{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(
                np.int16)
            rows.append((f"c{i}.wav", str(i % outputdim), str(h5)))
    tsv = tmp_path / "d.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    cfg = models.get_model_config("uit_xxxs", outputdim=outputdim,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)
    return ckpt, tsv


class TestDispatchDepth:
    def test_results_bitwise_identical_across_depths(self, tmp_path):
        from uit_mobile_tpu.data import read_tsv_data
        from uit_mobile_tpu.evaluate import Evaluator

        ckpt, tsv = _eval_fixture(tmp_path)
        df = read_tsv_data(tsv, basename=False)
        ref = None
        for depth in (1, 2, 8):
            ev = Evaluator(str(ckpt), batch_size=3, num_workers=0,
                           dispatch_depth=depth)
            assert ev._dispatch_depth == depth
            preds, _ = ev._run_epoch(df, num_classes=12)
            if ref is None:
                ref = preds
            else:
                np.testing.assert_array_equal(preds, ref)

    def test_rejects_nonpositive_depth(self):
        from uit_mobile_tpu.evaluate import Evaluator

        with pytest.raises(AssertionError):
            Evaluator(dispatch_depth=0)

    def test_cli_exposes_flag(self):
        from uit_mobile_tpu.cli import evaluate as cli_eval

        # every subcommand accepts --dispatch-depth; parse-only check
        with pytest.raises(SystemExit):
            cli_eval.main(["gsc", "--help"])


# ---------------------------------- calibration on every serving surface


class TestStreamingCalibration:
    def test_emit_applies_temperature_before_triggers(self):
        from uit_mobile_tpu.evaluate.calibration import apply_temperature
        from uit_mobile_tpu.serve.streaming import (
            MultiStreamTagger, StreamingConfig,
        )

        cfg = models.get_model_config("uit_xxxs", outputdim=12,
                                      target_length=102, depth=1)
        params, state = models.build(cfg, jax.random.key(0))
        # threshold off 0.5: temperature scaling is a contraction toward
        # 0.5, so only a non-0.5 operating point can see a trigger flip
        sc = StreamingConfig(n_audioset=8, threshold=0.52)
        T = 4.0
        plain = MultiStreamTagger(cfg, params, state, n_streams=1, config=sc)
        cal = MultiStreamTagger(cfg, params, state, n_streams=1, config=sc,
                                calibration=T)
        assert cal.calibration == T and plain.calibration is None

        probs = np.full((1, 12), 0.6, np.float32)
        probs[0, 9] = 0.55  # keyword: above raw threshold, below calibrated
        ev_plain = plain._emit([0], probs.copy())
        ev_cal = cal._emit([0], probs.copy())
        expect = apply_temperature(probs, T)
        np.testing.assert_allclose(ev_cal[0].probs, expect[0], atol=1e-7)
        # T=4 pulls 0.55 toward 0.5: sigmoid(logit(.55)/4) ~ 0.512 < 0.52
        # -> the trigger that fires uncalibrated must NOT fire calibrated
        assert any(c == 9 for c, _ in ev_plain[0].triggers)
        assert not any(c == 9 for c, _ in ev_cal[0].triggers)

    def test_stream_sessions_reload_keeps_calibration(self):
        from uit_mobile_tpu.serve.http import StreamSessions

        cfg = models.get_model_config("uit_xxxs", outputdim=12,
                                      target_length=102, depth=1)
        params, state = models.build(cfg, jax.random.key(0))
        ss = StreamSessions(cfg, params, state, max_sessions=2,
                            calibration=1.7)
        assert ss.tagger.calibration == 1.7
        assert ss.reload(cfg, params, state)
        assert ss.tagger.calibration == 1.7  # survives the weight swap


class TestEventsCalibration:
    def test_events_endpoint_uses_service_calibration(self):
        from uit_mobile_tpu.evaluate import extract_events
        from uit_mobile_tpu.evaluate.calibration import apply_temperature
        from uit_mobile_tpu.serve import (
            ServiceConfig, TaggingService, make_framewise_fn,
            make_http_server,
        )

        cfg = models.get_model_config("uit_xxxs", outputdim=6,
                                      target_length=102, depth=1)
        params, state = models.build(cfg, jax.random.key(1))
        T = 3.0
        service = TaggingService(
            cfg, params, state,
            ServiceConfig(batch_size=2, max_seconds=1, warmup=False,
                          max_wait_ms=1.0, dtype="float32"),
            calibration=T)
        fw = make_framewise_fn(cfg, params, state, max_seconds=1,
                               use_pallas=False)
        server = make_http_server(service, labels={i: f"l{i}" for i in
                                                   range(6)},
                                  port=0, framewise_fn=fw)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            wav = (np.random.default_rng(5).standard_normal(16000)
                   * 0.1).astype(np.float32)
            req = urllib.request.Request(
                base + "/events?format=f32&threshold=0.45",
                data=wav.tobytes(), method="POST",
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read().decode())
            probs, times = fw(wav)
            ref = [ev for ev in
                   extract_events(times, apply_temperature(probs, T),
                                  threshold=0.45) if ev[1] < 1.0]
            raw = [ev for ev in extract_events(times, probs, threshold=0.45)
                   if ev[1] < 1.0]
            got = [(e["index"], round(e["onset"], 6)) for e in out["events"]]
            assert got == [(int(c), round(on, 6)) for c, on, _ in ref]
            # the threshold sits where calibration changes the event set,
            # otherwise this test proves nothing
            assert [c for c, _, _ in ref] != [c for c, _, _ in raw]
        finally:
            server.shutdown()
            server.server_close()
            service.close()


# ------------------------------------------------ ensemble export spec


class TestEnsembleExport:
    def _two_ckpts(self, tmp_path):
        from uit_mobile_tpu.ckpt.io import save_checkpoint

        cfg = models.get_model_config("uit_xxxs", outputdim=6,
                                      target_length=102, depth=1)
        paths = []
        for i in range(2):
            p, s = models.build(cfg, jax.random.key(20 + i))
            path = tmp_path / f"m{i}.npz"
            save_checkpoint(path, p, s, cfg)
            paths.append(str(path))
        return cfg, paths

    def test_torch_export_rejects_ensemble_with_guidance(self, tmp_path):
        from uit_mobile_tpu.cli import export as cli_export

        _, paths = self._two_ckpts(tmp_path)
        with pytest.raises(SystemExit, match="uit-average"):
            cli_export.main([",".join(paths), "-o",
                             str(tmp_path / "out.pt")])

    def test_stablehlo_export_accepts_ensemble(self, tmp_path):
        import jax.numpy as jnp

        from uit_mobile_tpu.ckpt.artifact import load_artifact
        from uit_mobile_tpu.cli import export as cli_export
        from uit_mobile_tpu.ops.pipeline import make_forward_fn

        cfg, paths = self._two_ckpts(tmp_path)
        out = tmp_path / "ens.uitx"
        rc = cli_export.main([",".join(paths), "--stablehlo",
                              "--batch-size", "2", "--platforms", "cpu",
                              "-o", str(out)])
        assert rc == 0 and out.exists()
        fn, meta = load_artifact(out)
        wav = (np.random.default_rng(0).standard_normal((2, 16000))
               * 0.1).astype(np.float32)
        got = np.asarray(fn(jnp.asarray(wav)))
        # artifact == mean of the member forwards (pipeline policy)
        members = []
        from uit_mobile_tpu.ckpt.io import load_checkpoint

        for p in paths:
            pp, ss, c, _ = load_checkpoint(p)
            one = make_forward_fn(c, pp, ss, use_pallas=False,
                                  top_db_mode="per_sample")
            members.append(np.asarray(one(jnp.asarray(wav))))
        np.testing.assert_allclose(got, (members[0] + members[1]) / 2,
                                   atol=1e-5)


# --------------------------------------- calibrate head-width default


def test_calibrate_defaults_num_classes_to_head_width(tmp_path):
    from uit_mobile_tpu.data import read_tsv_data  # noqa: F401
    from uit_mobile_tpu.evaluate import Evaluator

    ckpt, tsv = _eval_fixture(tmp_path, outputdim=12)
    res = Evaluator(str(ckpt), batch_size=5, num_workers=0).calibrate(
        eval_data=str(tsv))
    # a 12-wide head calibrates without --num-classes (pre-fix: shape
    # error from the hardcoded 537)
    assert "temperature" in res and np.isfinite(res["ECE_before"])


# ------------------------------------------------ predictions dump


def test_dump_predictions_npz(tmp_path):
    """--dump-predictions: raw probs/targets/filenames land in one .npz,
    row-aligned with the manifest, and the dumped probs reproduce the
    reported metric exactly."""
    from uit_mobile_tpu.evaluate import Evaluator
    from uit_mobile_tpu.evaluate.metrics import gsc_accuracy

    ckpt, tsv = _eval_fixture(tmp_path)
    out = tmp_path / "preds.npz"
    ev = Evaluator(str(ckpt), batch_size=4, num_workers=0)
    res = ev.gsc(eval_data=str(tsv), dump_predictions=str(out))
    dumped = np.load(out, allow_pickle=True)
    assert dumped["preds"].shape == (10, 12)
    assert dumped["targets"].shape == (10, 12)
    assert list(dumped["filenames"]) == [f"c{i}.wav" for i in range(10)]
    # the dump IS the metric input: recomputing from it matches the report
    assert res["Accuracy@0.2"] == gsc_accuracy(
        dumped["preds"], dumped["targets"], threshold=0.2)
