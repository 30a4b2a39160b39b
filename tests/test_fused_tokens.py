"""Fused mel->patch-token kernel vs the 2-stage tfb path.

The fused kernel (ops/pallas_mel.pallas_mel_tokens) must reproduce the
2-stage pipeline — transposed mel kernel + per-sample clamp + BN-folded
patch embed (models.uit.patch_embed_tfb) — to fast-grade tolerance: the
only formulation difference is the token contraction's 3-pass bf16 split
vs XLA's einsum precision."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.ops.pallas_mel import pallas_log_mel, pallas_mel_tokens
from uit_mobile_tpu.ops.pipeline import make_forward_fn, make_fused_token_forward


@pytest.fixture(scope="module")
def model():
    cfg = models.get_model_config("uit_xs", outputdim=23, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    # non-trivial BN stats so the fold actually matters
    state = dict(state, init_bn={
        "mean": jnp.asarray(np.random.default_rng(1).normal(-10, 3, 64)
                            .astype(np.float32)),
        "var": jnp.asarray(np.random.default_rng(2).uniform(5, 50, 64)
                           .astype(np.float32)),
    })
    return cfg, params, state


def _two_stage_tokens(cfg, params, state, wav):
    fe = dataclasses.replace(cfg.frontend, top_db_mode="per_sample")
    mel = pallas_log_mel(wav, fe, precision="fast", layout="tfb")  # (T,F,B)
    return models.uit.patch_embed_tfb(cfg, params, state, mel)


def test_fused_tokens_match_two_stage(model):
    cfg, params, state = model
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)
    fg = cfg.grid_size[0]
    Kf, bias_f = models.uit._folded_patch_kernel(
        cfg, params, state, cfg.n_mels, fg, jnp.float32)
    got = np.asarray(pallas_mel_tokens(
        wav, dataclasses.replace(cfg.frontend, top_db_mode="per_sample"),
        Kf, bias_f, target_length=cfg.target_length, block_b=4))
    want = np.asarray(_two_stage_tokens(cfg, params, state, wav))
    assert got.shape == want.shape == (4, 4, 6, cfg.embed_dim)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fused_tokens_nondividing_block_b(model):
    """block_b that does not divide B picks the largest dividing block
    instead of crashing (B=6 with block_b=4 -> b_blk=3)."""
    cfg, params, state = model
    rng = np.random.default_rng(9)
    wav = jnp.asarray(rng.standard_normal((6, 16000)).astype(np.float32) * 0.1)
    fg = cfg.grid_size[0]
    Kf, bias_f = models.uit._folded_patch_kernel(
        cfg, params, state, cfg.n_mels, fg, jnp.float32)
    fe = dataclasses.replace(cfg.frontend, top_db_mode="per_sample")
    got = np.asarray(pallas_mel_tokens(
        wav, fe, Kf, bias_f, target_length=cfg.target_length, block_b=4))
    want = np.asarray(_two_stage_tokens(cfg, params, state, wav))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fused_tokens_int16_matches_f32(model):
    cfg, params, state = model
    rng = np.random.default_rng(3)
    f32 = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    pcm = np.round(f32 * 32768.0).clip(-32768, 32767).astype(np.int16)
    fg = cfg.grid_size[0]
    Kf, bias_f = models.uit._folded_patch_kernel(
        cfg, params, state, cfg.n_mels, fg, jnp.float32)
    fe = dataclasses.replace(cfg.frontend, top_db_mode="per_sample")
    kw = dict(target_length=cfg.target_length, block_b=2)
    a = np.asarray(pallas_mel_tokens(jnp.asarray(pcm), fe, Kf, bias_f, **kw))
    b = np.asarray(pallas_mel_tokens(
        jnp.asarray(pcm.astype(np.float32) / 32768.0), fe, Kf, bias_f, **kw))
    np.testing.assert_array_equal(a, b)


def test_fused_forward_matches_pipeline(model):
    cfg, params, state = model
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)
    fused = jax.jit(make_fused_token_forward(cfg, params, state, block_b=4))
    base = jax.jit(make_forward_fn(cfg, params, state, use_pallas=True,
                                   precision="fast",
                                   top_db_mode="per_sample"))
    got = np.asarray(fused(wav))
    want = np.asarray(base(wav))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_fused_clamp_binds_on_silent_tail(model):
    """A clip with a near-silent tail exercises the per-sample top_db
    clamp inside the kernel (values below max-120 dB must saturate
    exactly like the 2-stage clamp)."""
    cfg, params, state = model
    rng = np.random.default_rng(5)
    wav = np.zeros((2, 16000), np.float32)
    wav[:, :2000] = rng.standard_normal((2, 2000)).astype(np.float32)
    wav[:, 2000:] = 1e-8  # far below max-120dB once squared
    fg = cfg.grid_size[0]
    Kf, bias_f = models.uit._folded_patch_kernel(
        cfg, params, state, cfg.n_mels, fg, jnp.float32)
    fe = dataclasses.replace(cfg.frontend, top_db_mode="per_sample")
    got = np.asarray(pallas_mel_tokens(
        jnp.asarray(wav), fe, Kf, bias_f,
        target_length=cfg.target_length, block_b=2))
    want = np.asarray(_two_stage_tokens(cfg, params, state, jnp.asarray(wav)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fused_rejects_long_clips(model):
    cfg, params, state = model
    fg = cfg.grid_size[0]
    Kf, bias_f = models.uit._folded_patch_kernel(
        cfg, params, state, cfg.n_mels, fg, jnp.float32)
    with pytest.raises(AssertionError, match="single-window"):
        pallas_mel_tokens(
            jnp.zeros((2, 48000), jnp.float32),
            dataclasses.replace(cfg.frontend, top_db_mode="per_sample"),
            Kf, bias_f, target_length=cfg.target_length, block_b=2)
