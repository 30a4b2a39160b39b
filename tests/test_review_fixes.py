"""Regression tests for the full-codebase review findings."""

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models


def test_padded_window_matches_torch_stft_short_window():
    """win_length < n_fft must center-pad the window (torch.stft parity)."""
    import torch

    from uit_mobile_tpu.frontend import FrontendConfig, spectrogram

    cfg = FrontendConfig(n_fft=512, win_length=400)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    got = np.asarray(spectrogram(jnp.asarray(wav), cfg))
    win = torch.hann_window(400, periodic=True)
    spec = torch.stft(torch.from_numpy(wav), n_fft=512, hop_length=160,
                      win_length=400, window=win, center=True,
                      pad_mode="reflect", normalized=False, return_complex=True)
    want = (spec.real ** 2 + spec.imag ** 2).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_pallas_mel_short_input_raises():
    from uit_mobile_tpu.frontend import FrontendConfig
    from uit_mobile_tpu.ops import pallas_log_mel

    with pytest.raises(ValueError, match="too short"):
        pallas_log_mel(jnp.zeros((1, 100)), FrontendConfig())


def test_resolve_model_url_uses_local_copy(tmp_path, monkeypatch):
    from uit_mobile_tpu.cli import common
    from uit_mobile_tpu.ckpt.io import save_checkpoint

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    save_checkpoint(tmp_path / "uit_xs_maepretrained.npz", params, state, cfg)
    monkeypatch.setattr(common, "CACHE_DIR", tmp_path)
    # .pt URL resolves to a local .npz? No — filename must match; save as .pt-named npz
    # is wrong; instead test with matching name:
    url = "https://zenodo.org/record/7690036/files/uit_xs_maepretrained.npz?download=1"
    cfg2, p2, s2 = common.resolve_model(url)
    assert cfg2.outputdim == 537


def test_resolve_model_url_offline_error_is_clear(tmp_path, monkeypatch):
    from uit_mobile_tpu.cli import common

    monkeypatch.setattr(common, "CACHE_DIR", tmp_path / "empty")
    with pytest.raises(FileNotFoundError, match="checkpoints/nope.pt"):
        common.resolve_model("https://example.com/files/nope.pt?download=1")


def test_length_mask_with_patch_dropout_raises():
    cfg = models.get_model_config(
        "uit_xxxs", outputdim=5, target_length=102, depth=1,
        use_length_mask=True, time_patch_out=0.2,
    )
    params, state = models.build(cfg, jax.random.key(0))
    from uit_mobile_tpu.models import uit

    with pytest.raises(ValueError, match="incompatible"):
        uit.forward(cfg, params, state, jnp.zeros((1, 16000)),
                    lengths=jnp.asarray([8000]), train=True,
                    rng=jax.random.key(0))


def test_nonpsl_dual_loader_mixed_lengths(tmp_path):
    """Joint training without PSL/chunk_length: halves pad to different
    lengths and must be reconciled before concat."""
    import h5py

    from uit_mobile_tpu.train.loop import train_from_config

    rng = np.random.default_rng(0)

    def make(name, n, pool, length):
        h5 = tmp_path / f"{name}.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(n):
                f[f"{name}_{i}.wav"] = (rng.standard_normal(length) * 3000).astype(np.int16)
                rows.append((f"{name}_{i}.wav", str(int(rng.choice(pool))), str(h5)))
        tsv = tmp_path / f"{name}.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
            tsv, sep="\t", index=False)
        return str(tsv)

    out = train_from_config(dict(
        outputpath=str(tmp_path / "exp"), num_classes=537, model="uit_xxxs",
        # target_length must cover the longest training clip (2 s ~ 201
        # frames) — training has no crop-windowing (clear error otherwise)
        model_args={"target_length": 208, "depth": 1}, batch_size=8,
        epochs=1, epoch_length=2, warmup_iters=1,
        optimizer="AdamW", optimizer_args={"lr": 1e-3}, n_saved=1,
        num_workers=1, seed=0, config_stem="mixedlen",
        audioset_train_data=make("at", 8, np.arange(527), 32000),  # 2s clips
        kws_train_data=make("kt", 8, np.arange(527, 537), 16000),  # 1s clips
        audioset_eval_data=make("ae", 4, np.arange(527), 16000),
        kws_test_data=make("ke", 4, np.arange(527, 537), 16000),
        # no psl, no chunk_length -> WeakHDF5Dataset full clips
    ))
    assert out.exists()


def test_train_clip_longer_than_target_raises_clearly():
    from uit_mobile_tpu.models import uit

    cfg = models.get_model_config("uit_xxxs", outputdim=5, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="target_length"):
        uit.forward(cfg, params, state, jnp.zeros((1, 32000)), train=True,
                    rng=jax.random.key(0))


def test_device_prefetch_propagates_errors():
    from uit_mobile_tpu.data import device_prefetch

    def bad_iter():
        yield {"wav": np.zeros((2, 4), np.float32)}
        raise OSError("corrupt hdf5")

    it = device_prefetch(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_evaluator_respec_resolves_new_model(tmp_path):
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.evaluate import Evaluator

    cfg_a = models.get_model_config("uit_xxxs", outputdim=10, target_length=102, depth=1)
    cfg_b = models.get_model_config("uit_xxxs", outputdim=20, target_length=102, depth=1)
    pa, sa = models.build(cfg_a, jax.random.key(0))
    pb, sb = models.build(cfg_b, jax.random.key(1))
    save_checkpoint(tmp_path / "a.npz", pa, sa, cfg_a)
    save_checkpoint(tmp_path / "b.npz", pb, sb, cfg_b)
    ev = Evaluator()
    cfg1, *_ = ev._setup(str(tmp_path / "a.npz"))
    assert cfg1.outputdim == 10
    cfg2, *_ = ev._setup(str(tmp_path / "b.npz"))
    assert cfg2.outputdim == 20  # not the cached model


def test_evaluator_bucketed_padding(tmp_path):
    """bucket_seconds pads batches to second-multiples (bounded compile
    count); results stay close to exact padding for near-boundary clips."""
    import h5py

    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.evaluate import Evaluator

    rng = np.random.default_rng(0)
    h5 = tmp_path / "d.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i, L in enumerate([15500, 16000, 24000]):
            f[f"c{i}.wav"] = (rng.standard_normal(L) * 3000).astype(np.int16)
            rows.append((f"c{i}.wav", "530", str(h5)))
    tsv = tmp_path / "d.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)

    exact = Evaluator(str(ckpt), batch_size=2, num_workers=1)
    bucketed = Evaluator(str(ckpt), batch_size=2, num_workers=1, bucket_seconds=1.0)
    df = __import__("uit_mobile_tpu.data", fromlist=["read_tsv_data"]).read_tsv_data(tsv, basename=False)
    pe, te = exact._run_epoch(df, num_classes=537)
    pb, tb = bucketed._run_epoch(df, num_classes=537)
    assert pe.shape == pb.shape == (3, 537)
    # bucketing perturbs but does not upend predictions
    assert np.abs(pe - pb).max() < 0.2


def test_infer_config_target_length_1012():
    from uit_mobile_tpu.cli.common import infer_uit_config_from_state_dict
    from uit_mobile_tpu.ckpt.torch_convert import uit_torch_state_dict_from_params

    cfg = models.get_model_config("uit_xs", outputdim=527, target_length=1012)
    params, state = models.build(cfg, jax.random.key(0))
    sd = uit_torch_state_dict_from_params(params, state, cfg)
    inferred = infer_uit_config_from_state_dict(sd)
    assert inferred.target_length == 1012
