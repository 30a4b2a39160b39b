"""StableHLO serving artifacts (ckpt/artifact.py): export, roundtrip, CLI.

The deployable-unit replacement for the reference's external mobile
tooling (reference README.md:15-24): a serialized jax.export program must
reproduce the in-package forward exactly, survive a file roundtrip, and
run batch-polymorphically.
"""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.ckpt import (
    export_serving,
    load_artifact,
    save_artifact,
    save_checkpoint,
)
from uit_mobile_tpu.ops.pipeline import make_forward_fn


@pytest.fixture(scope="module")
def small_model():
    cfg = models.get_model_config("uit_xxxs", outputdim=7)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def _wav(b, n=16000, dtype="float32", seed=0):
    rng = np.random.default_rng(seed)
    if dtype == "int16":
        return rng.integers(-3000, 3000, (b, n), dtype=np.int16)
    return (rng.standard_normal((b, n)) * 0.1).astype(np.float32)


def test_fixed_batch_matches_forward(small_model):
    cfg, params, state = small_model
    exported = export_serving(cfg, params, state, batch_size=3,
                              platforms=("cpu",))
    wav = _wav(3)
    ref = make_forward_fn(cfg, params, state, use_pallas=False,
                          top_db_mode="per_sample")(jnp.asarray(wav))
    got = exported.call(jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)
    assert got.shape == (3, 7)


def test_polymorphic_batch_two_sizes(small_model):
    cfg, params, state = small_model
    exported = export_serving(cfg, params, state, batch_size=None,
                              platforms=("cpu",))
    for b in (2, 5):
        wav = _wav(b, seed=b)
        ref = make_forward_fn(cfg, params, state, use_pallas=False,
                              top_db_mode="per_sample")(jnp.asarray(wav))
        got = exported.call(jnp.asarray(wav))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)


def test_int16_artifact_matches_float32(small_model):
    # the package-wide int16 contract: folding 1/32768 into the DFT is
    # exact, so the int16 artifact must agree with the float32 path
    cfg, params, state = small_model
    exported = export_serving(cfg, params, state, batch_size=2,
                              dtype="int16", platforms=("cpu",))
    pcm = _wav(2, dtype="int16")
    ref = make_forward_fn(cfg, params, state, use_pallas=False,
                          top_db_mode="per_sample")(
        jnp.asarray(pcm.astype(np.float32) / 32768.0))
    got = exported.call(jnp.asarray(pcm))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_file_roundtrip_and_meta(small_model, tmp_path):
    cfg, params, state = small_model
    exported = export_serving(cfg, params, state, batch_size=None,
                              platforms=("cpu",))
    path = tmp_path / "model.uitx"
    save_artifact(path, exported, cfg=cfg, labels={"0": "Speech"},
                  extra={"note": "test"})
    fn, meta = load_artifact(path)
    assert meta["format"] == "uitx-v1"
    assert meta["input_dtype"] == "float32"
    assert meta["input_shape"] == ["b", "16000"]
    assert meta["platforms"] == ["cpu"]
    assert meta["labels"] == {"0": "Speech"}
    assert meta["config"]["__model_config__"] == "UITConfig"
    wav = _wav(4)
    ref = exported.call(jnp.asarray(wav))
    got = fn(jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # the zip is a plain archive with exactly the two documented members
    with zipfile.ZipFile(path) as z:
        assert sorted(z.namelist()) == ["meta.json", "model.stablehlo"]
        json.loads(z.read("meta.json").decode())


def test_pallas_requires_tpu_platforms(small_model):
    cfg, params, state = small_model
    with pytest.raises(ValueError, match="Mosaic"):
        export_serving(cfg, params, state, use_pallas=True,
                       platforms=("cpu", "tpu"))
    with pytest.raises(ValueError, match="batch_size"):
        export_serving(cfg, params, state, use_pallas=True,
                       batch_size=None, platforms=("tpu",))
    with pytest.raises(ValueError, match="dtype"):
        export_serving(cfg, params, state, dtype="float64",
                       platforms=("cpu",))


def test_service_from_artifact(small_model, tmp_path):
    from uit_mobile_tpu.serve import ServiceConfig, TaggingService

    cfg, params, state = small_model
    exported = export_serving(cfg, params, state, batch_size=None,
                              platforms=("cpu",))
    path = tmp_path / "m.uitx"
    save_artifact(path, exported, cfg=cfg, labels={"0": "a"})
    svc = TaggingService.from_artifact(
        path, ServiceConfig(batch_size=4, warmup=False, max_wait_ms=2.0,
                            dtype="float32"))
    assert svc.artifact_meta["labels"] == {"0": "a"}
    assert svc.cfg.max_seconds == 1
    wavs = [_wav(1, 16000 - 1000 * i, seed=i)[0] for i in range(5)]
    outs = svc.infer_many(wavs)
    for w, o in zip(wavs, outs):
        padded = np.zeros(16000, np.float32)
        padded[: w.shape[0]] = w
        ref = np.asarray(exported.call(jnp.asarray(padded[None])))[0]
        np.testing.assert_allclose(np.asarray(o), ref, rtol=0, atol=1e-6)
    # too-long clips still fail loudly at submit
    with pytest.raises(ValueError, match="max_seconds"):
        svc.submit(np.zeros(16001, np.float32))
    # the sealed program IS the weights: hot reload must refuse
    with pytest.raises(RuntimeError, match="artifact"):
        svc.reload(params, state)
    svc.close()


def test_from_artifact_rejections(small_model, tmp_path):
    from uit_mobile_tpu.serve import ServiceConfig, TaggingService

    cfg, params, state = small_model
    fixed = export_serving(cfg, params, state, batch_size=2,
                           platforms=("cpu",))
    p_fixed = save_artifact(tmp_path / "fixed.uitx", fixed, cfg=cfg)
    with pytest.raises(ValueError, match="batch-polymorphic"):
        TaggingService.from_artifact(p_fixed)
    poly = export_serving(cfg, params, state, batch_size=None,
                          platforms=("cpu",))
    p = save_artifact(tmp_path / "poly.uitx", poly, cfg=cfg)
    with pytest.raises(ValueError, match="dtype"):
        TaggingService.from_artifact(p, ServiceConfig(dtype="int16"))
    with pytest.raises(ValueError, match="data_parallel"):
        TaggingService.from_artifact(p, ServiceConfig(data_parallel=True))
    with pytest.raises(ValueError, match="scan_batches"):
        TaggingService.from_artifact(p, ServiceConfig(scan_batches=4))


def test_cli_stablehlo_verify(small_model, tmp_path):
    from uit_mobile_tpu.cli.export import main

    cfg, params, state = small_model
    ckpt = tmp_path / "ckpt.npz"
    save_checkpoint(ckpt, params, state, cfg)
    out = tmp_path / "model.uitx"
    rc = main([str(ckpt), "-o", str(out), "--stablehlo", "--platforms",
               "cpu", "--batch-size", "2", "--verify"])
    assert rc == 0 and out.exists()
    fn, meta = load_artifact(out)
    assert meta["input_shape"] == ["2", "16000"]
    probs = fn(jnp.asarray(_wav(2)))
    assert probs.shape == (2, 7)
    assert np.all(np.asarray(probs) >= 0) and np.all(np.asarray(probs) <= 1)
