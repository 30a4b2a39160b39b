"""Regression tests for the second round-4 review batch (high-effort
review of a1faa45..HEAD): frontend-layout validation on BOTH
make_frontend_fn paths, the btf=False escape hatch covering the non-UiT
tfb_to_bft route, the shared TFB_MIN_BATCH constant, and early (before
side effects) frontend_precision validation in both training loops."""

import numpy as np
import pytest

from uit_mobile_tpu import models

# ------------------------------------------------- layout validation


class TestFrontendLayoutValidation:
    def test_pallas_path_rejects_typo(self):
        from uit_mobile_tpu.ops import make_frontend_fn

        with pytest.raises(ValueError, match="layout"):
            make_frontend_fn(None, use_pallas=True, layout="tfb_to_btf")

    def test_non_pallas_path_rejects_typo(self):
        """The non-pallas fallthrough used to map ANY unknown layout
        silently to the bft chain — a typo of 'tfb_to_bft' would pass
        every CPU test and only blow up (or silently transpose) on TPU."""
        from uit_mobile_tpu.ops import make_frontend_fn

        with pytest.raises(ValueError, match="layout"):
            make_frontend_fn(None, use_pallas=False, layout="tfb_to_btf")

    def test_all_documented_layouts_accepted_on_both_paths(self):
        from uit_mobile_tpu.ops import make_frontend_fn

        for layout in ("bft", "btf", "tfb", "tfb_to_bft"):
            for use_pallas in (False, True):
                assert callable(make_frontend_fn(
                    None, use_pallas=use_pallas, layout=layout))


def test_tfb_min_batch_is_the_shared_gate():
    """pallas_log_mel's small-batch tfb guard and the tfb_to_bft route's
    row-kernel fallback key on ONE module constant (retuning the lane
    gate must not split the two sites)."""
    import inspect

    from uit_mobile_tpu.ops import pallas_mel

    assert pallas_mel.TFB_MIN_BATCH == 128
    src = inspect.getsource(pallas_mel)
    # no raw `< 128` gates left outside the constant's definition
    assert "< 128" not in src.replace("TFB_MIN_BATCH = 128", "")


# ------------------------------------------ btf=False escape hatch


def test_forward_fn_btf_false_pins_row_kernel_for_mbv2(monkeypatch):
    """make_forward_fn(btf=False) must disable the non-UiT tfb_to_bft
    route too — the documented A/B-debugging escape hatch."""
    from uit_mobile_tpu.ops import pipeline

    seen = {}

    def recorder(cfg, use_pallas=True, precision="exact", layout="bft",
                 block_rows=None):
        seen["layout"] = layout
        from uit_mobile_tpu.ops.pallas_mel import make_frontend_fn
        return make_frontend_fn(cfg, use_pallas=use_pallas,
                                precision=precision, layout=layout)

    monkeypatch.setattr(pipeline, "make_frontend_fn", recorder)
    cfg = models.get_model_config("MobileNetV2", outputdim=5)
    params, state = models.build(cfg, __import__("jax").random.key(0))

    pipeline.make_forward_fn(cfg, params, state, use_pallas=True,
                             precision="fast")
    assert seen["layout"] == "tfb_to_bft"  # default: transposed route

    pipeline.make_forward_fn(cfg, params, state, use_pallas=True,
                             precision="fast", btf=False)
    assert seen["layout"] == "bft"  # escape hatch: plain row kernel


# ------------------------- frontend_precision early, shared validation


def test_trainer_rejects_bad_precision_before_outputdir(tmp_path):
    """A typo'd frontend_precision must fail BEFORE the experiment
    outputdir side effect (it used to fail only after model+data
    builds, leaving a junk run directory behind)."""
    from uit_mobile_tpu.train.loop import Trainer

    out = tmp_path / "experiments"
    cfg = {"outputpath": str(out), "config_stem": "t", "model": "uit_xxxs",
           "batch_size": 4, "epochs": 1, "frontend_precision": "speedy"}
    with pytest.raises(ValueError, match="frontend_precision"):
        Trainer(cfg)
    assert not out.exists()


def test_sed_rejects_bad_precision_before_outputdir(tmp_path):
    from uit_mobile_tpu.train.sed import train_sed_from_config

    out = tmp_path / "experiments"
    cfg = {"outputpath": str(out), "config_stem": "sed", "model": "uit_xxxs",
           "batch_size": 4, "epochs": 1, "frontend_precision": "speedy",
           "train_data": "missing.tsv", "eval_data": "missing.tsv"}
    with pytest.raises(ValueError, match="frontend_precision"):
        train_sed_from_config(cfg)
    assert not out.exists()


def test_shared_validator_resolves_default():
    from uit_mobile_tpu.utils import validate_frontend_precision

    assert validate_frontend_precision({}) == "exact"
    assert validate_frontend_precision({"frontend_precision": "fast"}) == "fast"
    with pytest.raises(ValueError, match="frontend_precision"):
        validate_frontend_precision({"frontend_precision": 1})
