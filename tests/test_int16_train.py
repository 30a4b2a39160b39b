"""int16 PCM trains bitwise-identically to the f32 convention.

The serving stack has shipped raw int16 wav since round 1 (the frontends
fold the 1/32768 scale into their DFT matrices exactly —
ops/pallas_mel.py, frontend/mel.py); training used to up-cast to f32 on
device before the forwards, so its framing gathers materialized 4-byte
frames. The step now keeps int16 through to the frontends whenever no
wav augment is configured (augments assume normalized f32 — reference
uit.py:453-454 applies them inside the student's train forward). These
tests pin the equivalence: one train step fed raw int16 must produce
EXACTLY the same loss and parameters as the same step fed wav/32768.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.augment import parse_wavtransforms
from uit_mobile_tpu.ops import make_frontend_fn
from uit_mobile_tpu.train.steps import (
    make_framewise_train_step,
    make_train_step,
)


def _pcm(rng, n, t=16000):
    i16 = rng.integers(-8000, 8000, size=(n, t), dtype=np.int16)
    return jnp.asarray(i16), jnp.asarray(i16.astype(np.float32) / 32768.0)


def _targets(rng, n, C):
    return jnp.asarray((rng.random((n, C)) < 0.05).astype(np.float32))


@pytest.fixture(scope="module")
def student():
    cfg = models.get_model_config("uit_xxxs", outputdim=537,
                                  target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def _assert_tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_plain_step_int16_bitwise(student):
    cfg, params, state = student
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, mixup_alpha=0.3)
    rng = np.random.default_rng(0)
    wav_i, wav_f = _pcm(rng, 4)
    tgt = _targets(rng, 4, 537)
    key = jax.random.key(1)
    o0 = opt.init(params)
    p_i, s_i, _, m_i = step(params, state, o0, {"wav": wav_i, "target": tgt}, key)
    p_f, s_f, _, m_f = step(params, state, o0, {"wav": wav_f, "target": tgt}, key)
    assert float(m_i["total_loss"]) == float(m_f["total_loss"])
    _assert_tree_equal(p_i, p_f)
    _assert_tree_equal(s_i, s_f)


def test_flat_psl_step_int16_bitwise(student):
    """The production path: flat [audioset, kws] batch + MobileNetV2
    teacher — the teacher's slice rides int16 into its own frontend."""
    cfg, params, state = student
    t_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    t_params, t_state = models.build(t_cfg, jax.random.key(3))
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, psl_cfg=t_cfg, psl_split=4,
                           mixup_alpha=0.3)
    rng = np.random.default_rng(1)
    wav_i, wav_f = _pcm(rng, 8)
    tgt = _targets(rng, 8, 537)
    key = jax.random.key(2)
    o0 = opt.init(params)
    p_i, _, _, m_i = step(params, state, o0, {"wav": wav_i, "target": tgt},
                          key, t_params, t_state)
    p_f, _, _, m_f = step(params, state, o0, {"wav": wav_f, "target": tgt},
                          key, t_params, t_state)
    assert float(m_i["total_loss"]) == float(m_f["total_loss"])
    _assert_tree_equal(p_i, p_f)


def test_tfb_layout_int16_bitwise():
    """The round-4 training-frontier composition accepts int16: tfb
    student layout + explicit teacher frontend."""
    cfg = models.get_model_config("uit_xxxs", outputdim=537,
                                  target_length=102, depth=1,
                                  mel_layout="tfb")
    params, state = models.build(cfg, jax.random.key(0))
    t_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    t_params, t_state = models.build(t_cfg, jax.random.key(3))
    opt = optax.adam(1e-3)
    step = make_train_step(
        cfg, opt, psl_cfg=t_cfg, psl_split=4,
        frontend_fn=make_frontend_fn(cfg.frontend, use_pallas=False,
                                     layout="tfb"),
        psl_frontend_fn=make_frontend_fn(t_cfg.frontend, use_pallas=False),
    )
    rng = np.random.default_rng(2)
    wav_i, wav_f = _pcm(rng, 8)
    tgt = _targets(rng, 8, 537)
    key = jax.random.key(4)
    o0 = opt.init(params)
    p_i, _, _, m_i = step(params, state, o0, {"wav": wav_i, "target": tgt},
                          key, t_params, t_state)
    p_f, _, _, m_f = step(params, state, o0, {"wav": wav_f, "target": tgt},
                          key, t_params, t_state)
    assert float(m_i["total_loss"]) == float(m_f["total_loss"])
    _assert_tree_equal(p_i, p_f)


def test_framewise_step_int16_bitwise():
    cfg = models.get_model_config("uit_xxxs", outputdim=10,
                                  target_length=102, depth=1, pooling="dm")
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adam(1e-3)
    step = make_framewise_train_step(cfg, opt)
    rng = np.random.default_rng(3)
    wav_i, wav_f = _pcm(rng, 4)
    n_seg = 102 // cfg.patch_stride
    tgt = jnp.asarray((rng.random((4, n_seg, 10)) < 0.1).astype(np.float32))
    key = jax.random.key(5)
    o0 = opt.init(params)
    p_i, _, _, m_i = step(params, state, o0, {"wav": wav_i, "target": tgt}, key)
    p_f, _, _, m_f = step(params, state, o0, {"wav": wav_f, "target": tgt}, key)
    assert float(m_i["total_loss"]) == float(m_f["total_loss"])
    _assert_tree_equal(p_i, p_f)


def test_wav_augment_rejects_int16(student):
    """Wav augments assume normalized f32; with one configured the step
    up-casts (bitwise-equal via the 1/32768 fold), and feeding int16
    straight into the model's train forward raises loudly."""
    cfg, params, state = student
    aug = parse_wavtransforms({"Gain": {"p": 1.0}})
    rng = np.random.default_rng(4)
    wav_i, wav_f = _pcm(rng, 2)
    # direct model-level call: loud rejection
    with pytest.raises(ValueError, match="wav augments"):
        models.apply(cfg, params, state, wav_i, train=True,
                     rng=jax.random.key(0), wav_augment=aug)
    # step-level: int16 is normalized first, equal to the f32 batch
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, wav_augment=aug)
    tgt = _targets(rng, 2, 537)
    key = jax.random.key(6)
    o0 = opt.init(params)
    _, _, _, m_i = step(params, state, o0, {"wav": wav_i, "target": tgt}, key)
    _, _, _, m_f = step(params, state, o0, {"wav": wav_f, "target": tgt}, key)
    assert float(m_i["total_loss"]) == float(m_f["total_loss"])


def test_mobilenetv2_train_int16_policy_mirrors_uit():
    """Direct MobileNetV2 train callers get the same relaxed policy as
    uit.forward: int16 succeeds bitwise without wav augments, raises only
    with one configured (ADVICE round 4)."""
    cfg = models.get_model_config("MobileNetV2", outputdim=527, width_mult=0.25)
    params, state = models.build(cfg, jax.random.key(0))
    rng = np.random.default_rng(6)
    wav_i, wav_f = _pcm(rng, 2)
    key = jax.random.key(8)
    p_i, s_i = models.apply(cfg, params, state, wav_i, train=True, rng=key)
    p_f, s_f = models.apply(cfg, params, state, wav_f, train=True, rng=key)
    np.testing.assert_array_equal(np.asarray(p_i), np.asarray(p_f))
    _assert_tree_equal(s_i, s_f)
    aug = parse_wavtransforms({"Gain": {"p": 1.0}})
    with pytest.raises(ValueError, match="wav augments"):
        models.apply(cfg, params, state, wav_i, train=True,
                     rng=jax.random.key(0), wav_augment=aug)


def test_dict_psl_mixed_dtype_normalizes(student):
    """Dict batches with MIXED wav dtypes must not type-promote raw PCM:
    both halves are normalized to f32 and the step equals the all-f32 run."""
    cfg, params, state = student
    t_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    t_params, t_state = models.build(t_cfg, jax.random.key(3))
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, psl_cfg=t_cfg)
    rng = np.random.default_rng(5)
    as_i, as_f = _pcm(rng, 2)
    kws_f = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    tgt_a, tgt_k = _targets(rng, 2, 537), _targets(rng, 2, 537)
    key = jax.random.key(7)
    o0 = opt.init(params)
    mixed = {"audioset": {"wav": as_i, "target": tgt_a},
             "kws": {"wav": kws_f, "target": tgt_k}}
    full_f = {"audioset": {"wav": as_f, "target": tgt_a},
              "kws": {"wav": kws_f, "target": tgt_k}}
    p_m, _, _, m_m = step(params, state, o0, mixed, key, t_params, t_state)
    p_f, _, _, m_f = step(params, state, o0, full_f, key, t_params, t_state)
    assert float(m_m["total_loss"]) == float(m_f["total_loss"])
    _assert_tree_equal(p_m, p_f)
