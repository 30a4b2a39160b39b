"""Whole-encoder Pallas kernel (v2) vs the XLA block loop.

f32 mode must match models.uit._finish_features to f32 rounding; bf16
mode (serving) must keep end-to-end probability drift inside the 1e-3
fast-path budget. Interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.ops.pallas_encoder_tfb import encoder_forward
from uit_mobile_tpu.ops.pipeline import (
    make_forward_fn, make_fused_encoder_forward,
)


@pytest.fixture(scope="module", params=["uit_xs", "uit_xxxs",
                                        "audio_transformer_h128_d4_m3"])
def model(request):
    cfg = models.get_model_config(request.param, outputdim=19,
                                  target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def _ref_and_x0(cfg, params, B=4, seed=0):
    rng = np.random.default_rng(seed)
    fg, tg = cfg.grid_size
    grid = jnp.asarray(
        rng.standard_normal((B, fg, tg, cfg.embed_dim)).astype(np.float32))
    ref = np.asarray(models.uit._finish_features(cfg, params, grid))
    x0 = grid + params["time_pos_embed"][None, None, :tg, :]
    x0 = x0 + params["freq_pos_embed"][None, :, None, :]
    return ref, x0.reshape(B, -1, cfg.embed_dim)


def test_f32_mode_matches_block_loop(model):
    cfg, params, state = model
    if cfg.pooling == "token":
        pytest.skip("kernel supports the shipped mean-pooling factories")
    ref, x0 = _ref_and_x0(cfg, params)
    got = np.asarray(encoder_forward(cfg, params, x0, precision="f32",
                                     block_b=2))
    # 5e-5: the multiply-reduce gram vs XLA's dot accumulates f32
    # rounding differently (largest for full attention at hd=64)
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_bf16_mode_close(model):
    cfg, params, state = model
    ref, x0 = _ref_and_x0(cfg, params, seed=1)
    got = np.asarray(encoder_forward(cfg, params, x0, precision="bf16",
                                     block_b=2))
    # token-level bf16-product drift; probs-level budget checked below
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_fused_encoder_forward_end_to_end(model):
    cfg, params, state = model
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)
    base = make_forward_fn(cfg, params, state, use_pallas=True,
                           precision="fast")
    f32 = make_fused_encoder_forward(cfg, params, state, block_b=2,
                                     precision="f32")
    bf16 = make_fused_encoder_forward(cfg, params, state, block_b=2)
    a = np.asarray(base(wav))
    np.testing.assert_allclose(np.asarray(f32(wav)), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bf16(wav)), a, atol=1e-3)


def test_int16_matches_f32_input(model):
    cfg, params, state = model
    rng = np.random.default_rng(3)
    f = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    pcm = np.round(f * 32768.0).clip(-32768, 32767).astype(np.int16)
    fwd = make_fused_encoder_forward(cfg, params, state, block_b=2)
    a = np.asarray(fwd(jnp.asarray(pcm)))
    b = np.asarray(fwd(jnp.asarray(pcm.astype(np.float32) / 32768.0)))
    np.testing.assert_array_equal(a, b)


def test_fused_mlp_matches_xla(model):
    from uit_mobile_tpu.models.common import layer_norm, mlp
    from uit_mobile_tpu.ops.pallas_encoder_tfb import fused_mlp

    cfg, params, state = model
    blk = params["blocks"][0]
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((16, cfg.embed_dim))
                    .astype(np.float32))
    want = np.asarray(
        x + mlp(blk["mlp"], layer_norm(blk["norm2"], x, eps=1e-6),
                act=cfg.act))
    got = np.asarray(fused_mlp(blk, x, act=cfg.act, precision="f32",
                               block_m=8))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hybrid_forward_matches_base(model):
    cfg, params, state = model
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    base = make_forward_fn(cfg, params, state, use_pallas=True,
                           precision="fast")
    hyb32 = make_fused_encoder_forward(cfg, params, state, mode="hybrid",
                                       precision="f32")
    hyb16 = make_fused_encoder_forward(cfg, params, state, mode="hybrid")
    a = np.asarray(base(wav))
    np.testing.assert_allclose(np.asarray(hyb32(wav)), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hyb16(wav)), a, atol=1e-3)
