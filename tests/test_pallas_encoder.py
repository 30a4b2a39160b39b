"""Fused whole-encoder kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.ops import pallas_encoder
from uit_mobile_tpu.ops.pipeline import fused_forward, make_forward_fn


@pytest.mark.parametrize("name", ["uit_xxxs", "audio_transformer_h128_d4_m3_relu"])
def test_fused_forward_matches_xla(name):
    cfg = models.get_model_config(name, outputdim=537, target_length=102)
    assert pallas_encoder.supports(cfg)
    params, state = models.build(cfg, jax.random.key(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 16000)).astype(np.float32) * 0.1
    )
    want = models.apply(cfg, params, state, wav)
    got = fused_forward(cfg, params, state, wav, clips_per_block=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_forward_long_clip_crops():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(1))
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 48000)).astype(np.float32) * 0.1
    )
    want = models.apply(cfg, params, state, wav)
    got = fused_forward(cfg, params, state, wav, clips_per_block=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_banding_divides_block():
    cfg = models.get_model_config("uit_xxxs", outputdim=10, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(2))
    wav = jnp.zeros((6, 16000))
    # R=6, band_clips=4 -> band falls back to a divisor of R
    out = fused_forward(cfg, params, state, wav, clips_per_block=6)
    assert out.shape == (6, 10)


def test_supports_gates():
    assert not pallas_encoder.supports(
        models.get_model_config("uit_xxxs", outputdim=10, pooling="token")
    )
    assert not pallas_encoder.supports(
        models.get_model_config("uit_xxxs", outputdim=10, init_values=1e-5)
    )


def test_make_forward_fn_dispatch():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(3))
    wav = jnp.zeros((2, 16000))
    fn = make_forward_fn(cfg, params, state, use_pallas=False)
    assert fn(wav).shape == (2, 537)
    fn2 = make_forward_fn(cfg, params, state, use_pallas=True)  # interpret on CPU
    np.testing.assert_allclose(
        np.asarray(fn2(wav)), np.asarray(fn(wav)), atol=1e-3
    )
