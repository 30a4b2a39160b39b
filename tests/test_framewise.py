"""Temporal (framewise) tagging API: per-segment probabilities whose mean
reproduces the clip-level forward, with consistent time extents."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models


def _wav(b, t, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, t)).astype(np.float32) * 0.1
    )


def test_mean_pooling_framewise_windows_match_forward():
    cfg = models.get_model_config("uit_xxxs", outputdim=11, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    wav = _wav(2, 40000)  # 2.5 s -> 3 windows (tail = last full window)
    probs, times = models.apply_framewise(cfg, params, state, wav)
    assert probs.shape == (2, 3, 11)
    assert times.shape == (3, 2)
    # window extents: 102 frames = 1.02 s; tail starts so it ENDS at clip end
    np.testing.assert_allclose(times[0], [0.0, 1.02])
    np.testing.assert_allclose(times[1], [1.02, 2.04])
    assert times[2][0] < times[1][1] and times[2][1] == pytest.approx(2.51)
    # mean over windows == forward with eval_avg='mean'
    clip = np.asarray(models.apply(cfg, params, state, wav))
    np.testing.assert_allclose(np.asarray(probs).mean(axis=1), clip, atol=1e-6)


def test_dm_pooling_framewise_patches_match_forward():
    cfg = models.get_model_config("uit_xxxs", outputdim=7, target_length=102,
                                  depth=1, pooling="dm")
    params, state = models.build(cfg, jax.random.key(1))
    wav = _wav(1, 16000, seed=1)  # single window, 6 time patches
    probs, times = models.apply_framewise(cfg, params, state, wav)
    assert probs.shape == (1, 6, 7)
    assert times.shape == (6, 2)
    np.testing.assert_allclose(times[:, 1] - times[:, 0], 0.16)
    clip = np.asarray(models.apply(cfg, params, state, wav))
    np.testing.assert_allclose(np.asarray(probs).mean(axis=1), clip, atol=1e-6)


def test_mobilenetv2_framewise_matches_forward():
    from uit_mobile_tpu.models.mobilenetv2 import total_time_stride

    cfg = models.get_model_config("MobileNetV2", outputdim=9)
    assert total_time_stride(cfg) == 32  # stem + 4 stride-2 stages
    params, state = models.build(cfg, jax.random.key(2))
    wav = _wav(2, 16000, seed=2)
    probs, times = models.apply_framewise(cfg, params, state, wav)
    B, S, C = probs.shape
    assert (B, C) == (2, 9)
    assert times.shape == (S, 2)
    np.testing.assert_allclose(times[:, 1] - times[:, 0], 0.32)
    # the time grid must actually COVER the clip (regression: a wrong
    # stride constant compressed all timestamps 2x)
    clip_seconds = 16000 / 16000
    assert times[-1, 1] >= clip_seconds - 0.32
    assert times[-1, 1] <= clip_seconds + 0.32 + 1e-9
    clip = np.asarray(models.apply(cfg, params, state, wav))
    np.testing.assert_allclose(np.asarray(probs).mean(axis=1), clip, atol=1e-6)


def test_infer_cli_timestamps(tmp_path, capsys):
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.cli.infer import main

    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(3))
    ckpt = tmp_path / "m.npz"
    save_checkpoint(ckpt, params, state, cfg)
    rc = main(["samples/85b877b5_nohash_0.wav", "-m", str(ckpt), "-k", "2",
               "--timestamps"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[" in out and "s]" in out and "=====" in out