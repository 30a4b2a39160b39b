"""The transpose-free 'tfb' TRAINING path (PERF_NOTES round 4).

Training used to be 'bft'-only: the row-kernel frontend pays a 0.66 ms
frames-relayout copy per step at B=1024 that the serving 'tfb' layout
eliminated in round 2. The tfb train branch (models/uit.forward) must be
math-identical to the bft reference path — same rng stream, same augment
semantics, same BN statistics — with only f32 reassociation drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.augment.mixup import mixup_tensor, sample_mixup_lambdas
from uit_mobile_tpu.augment.spec import (
    frequency_masking, parse_spectransforms, time_masking,
)
from uit_mobile_tpu.models import uit as uit_mod
from uit_mobile_tpu.ops import make_frontend_fn

B, TW = 6, 16000


def _wav(seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.standard_normal((B, TW)).astype(np.float32) * 0.1)


def _cfgs(**kw):
    base = dict(outputdim=21, target_length=102, **kw)
    return (models.get_model_config("uit_xxxs", mel_layout="bft", **base),
            models.get_model_config("uit_xxxs", mel_layout="tfb", **base))


# --------------------------------------------------- augment equivalence

@pytest.mark.parametrize("iid", [True, False])
def test_spec_masks_tfb_bitwise_transposed(iid):
    r = np.random.default_rng(3)
    bft = jnp.asarray(r.standard_normal((B, 64, 101)).astype(np.float32))
    tfb = jnp.transpose(bft, (2, 1, 0))
    key = jax.random.key(5)
    a = time_masking(key, bft, 20, iid_masks=iid)
    b = time_masking(key, tfb, 20, iid_masks=iid, layout="tfb")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b).transpose(2, 1, 0))
    a = frequency_masking(key, bft, 8, iid_masks=iid)
    b = frequency_masking(key, tfb, 8, iid_masks=iid, layout="tfb")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b).transpose(2, 1, 0))


def test_parse_spectransforms_layout():
    spec = [{"TimeMasking": {"time_mask_param": 20}},
            {"FrequencyMasking": {"freq_mask_param": 8}}]
    f_bft = parse_spectransforms(spec)
    f_tfb = parse_spectransforms(spec, layout="tfb")
    assert f_bft.layout == "bft" and f_tfb.layout == "tfb"
    r = np.random.default_rng(0)
    bft = jnp.asarray(r.standard_normal((B, 64, 101)).astype(np.float32))
    key = jax.random.key(11)
    a = f_bft(key, bft)
    b = f_tfb(key, jnp.transpose(bft, (2, 1, 0)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b).transpose(2, 1, 0))
    with pytest.raises(ValueError, match="bft.*tfb|tfb.*bft"):
        parse_spectransforms(spec, layout="btf")


def test_mixup_batch_axis():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((B, 64, 101)).astype(np.float32))
    lamb = sample_mixup_lambdas(jax.random.key(2), B, 0.3)
    a = mixup_tensor(x, lamb)
    b = mixup_tensor(jnp.transpose(x, (2, 1, 0)), lamb, batch_axis=-1)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(b).transpose(2, 1, 0), atol=1e-7)


# ------------------------------------------------- patch embed equivalence

def test_patch_embed_tfb_train_matches_bft():
    cfg_b, _ = _cfgs()
    params, _ = models.build(cfg_b, jax.random.key(0))
    r = np.random.default_rng(7)
    mel = jnp.asarray(r.standard_normal((B, 64, 101)).astype(np.float32))
    want = uit_mod.patch_embed(cfg_b, params["patch_embed"], mel)
    got = uit_mod.patch_embed_tfb_train(cfg_b, params["patch_embed"],
                                        jnp.transpose(mel, (2, 1, 0)))
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               atol=2e-5, rtol=1e-5)


# --------------------------------------------- full forward/step equivalence

def _spec_aug(layout):
    return parse_spectransforms(
        [{"TimeMasking": {"time_mask_param": 20}},
         {"FrequencyMasking": {"freq_mask_param": 8}}], layout=layout)


def test_train_forward_tfb_matches_bft():
    """Same params/wav/rng: probs + BN state agree to f32 reassociation."""
    cfg_b, cfg_t = _cfgs(init_bn=True)
    params, state = models.build(cfg_b, jax.random.key(0))
    wav = _wav()
    lamb = sample_mixup_lambdas(jax.random.key(3), B, 0.3)
    fe_b = make_frontend_fn(cfg_b.frontend, use_pallas=False, layout="bft")
    fe_t = make_frontend_fn(cfg_t.frontend, use_pallas=False, layout="tfb")
    pb, sb = uit_mod.forward(cfg_b, params, state, wav, train=True,
                             rng=jax.random.key(9), mixup_lamb=lamb,
                             spec_augment=_spec_aug("bft"), frontend_fn=fe_b)
    pt, st = uit_mod.forward(cfg_t, params, state, wav, train=True,
                             rng=jax.random.key(9), mixup_lamb=lamb,
                             spec_augment=_spec_aug("tfb"), frontend_fn=fe_t)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pt),
                               atol=2e-5, rtol=1e-4)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(sb["init_bn"][k]), np.asarray(st["init_bn"][k]),
            atol=1e-5, rtol=1e-5)


def test_train_forward_tfb_rejects_bft_augments_accepts_int16():
    """Round-4 contract: the tfb TRAIN branch rejects mismatched-layout
    spec augments, accepts raw int16 PCM bitwise (no wav augments), and
    rejects int16 only when a wav augment is configured (augments assume
    normalized f32 — reference uit.py:453-454)."""
    cfg_b, cfg_t = _cfgs()
    params, state = models.build(cfg_b, jax.random.key(0))
    fe_t = make_frontend_fn(cfg_t.frontend, use_pallas=False, layout="tfb")
    with pytest.raises(ValueError, match="layout='tfb'"):
        uit_mod.forward(cfg_t, params, state, _wav(), train=True,
                        rng=jax.random.key(0),
                        spec_augment=_spec_aug("bft"), frontend_fn=fe_t)
    from uit_mobile_tpu.augment import parse_wavtransforms
    from uit_mobile_tpu.frontend import quantize_pcm16

    pcm = quantize_pcm16(np.asarray(_wav()) * 0.1)
    with pytest.raises(ValueError, match="wav augments"):
        uit_mod.forward(cfg_t, params, state, pcm, train=True,
                        rng=jax.random.key(0), frontend_fn=fe_t,
                        wav_augment=parse_wavtransforms({"Gain": {"p": 1.0}}))
    key = jax.random.key(0)
    p_i, s_i = uit_mod.forward(cfg_t, params, state, pcm, train=True,
                               rng=key, frontend_fn=fe_t)
    from uit_mobile_tpu.frontend import normalize_pcm16

    p_f, s_f = uit_mod.forward(cfg_t, params, state, normalize_pcm16(pcm),
                               train=True, rng=key, frontend_fn=fe_t)
    np.testing.assert_array_equal(np.asarray(p_i), np.asarray(p_f))
    for x, y in zip(jax.tree.leaves(s_i), jax.tree.leaves(s_f)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_forward_bft_rejects_tfb_augments():
    """The converse guard: a 'tfb'-built spec augment on a bft model
    broadcasts without error ((B,1,T) onto (B,F,T)) but masks the wrong
    axes — it must raise, symmetric to the tfb branch's check."""
    cfg_b, _ = _cfgs()
    params, state = models.build(cfg_b, jax.random.key(0))
    fe_b = make_frontend_fn(cfg_b.frontend, use_pallas=False, layout="bft")
    with pytest.raises(ValueError, match="layout='bft'"):
        uit_mod.forward(cfg_b, params, state, _wav(), train=True,
                        rng=jax.random.key(0),
                        spec_augment=_spec_aug("tfb"), frontend_fn=fe_b)


def test_train_forward_tfb_tolerates_rng_none():
    """No augments, no mixup, no dropout -> rng=None trains on BOTH
    layouts (BN-stat-only fine-tuning); the tfb branch used to crash in
    jax.random.split where bft guarded."""
    cfg_b, cfg_t = _cfgs(init_bn=True)
    params, state = models.build(cfg_b, jax.random.key(0))
    wav = _wav()
    fe_b = make_frontend_fn(cfg_b.frontend, use_pallas=False, layout="bft")
    fe_t = make_frontend_fn(cfg_t.frontend, use_pallas=False, layout="tfb")
    pb, sb = uit_mod.forward(cfg_b, params, state, wav, train=True,
                             rng=None, frontend_fn=fe_b)
    pt, st = uit_mod.forward(cfg_t, params, state, wav, train=True,
                             rng=None, frontend_fn=fe_t)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pt),
                               atol=2e-5, rtol=1e-4)


def test_full_psl_step_tfb_matches_bft():
    """One fused PSL train step in each layout: loss, grad norm, updated
    params agree (separate teacher frontend on the tfb side)."""
    from uit_mobile_tpu.train.steps import make_train_step

    psl_cfg = models.get_model_config("MobileNetV2", outputdim=17)
    psl_params, psl_state = models.build(psl_cfg, jax.random.key(1))
    fe_bft = make_frontend_fn(None, use_pallas=False, layout="bft")
    fe_tfb = make_frontend_fn(None, use_pallas=False, layout="tfb")

    r = np.random.default_rng(0)
    batch = {
        "wav": jnp.asarray(r.standard_normal((B, TW)).astype(np.float32) * 0.1),
        "target": jnp.asarray((r.uniform(size=(B, 21)) > 0.7)
                              .astype(np.float32)),
    }

    outs = {}
    for name, layout, fe, psl_fe in (("bft", "bft", fe_bft, None),
                                     ("tfb", "tfb", fe_tfb, fe_bft)):
        cfg = models.get_model_config("uit_xxxs", outputdim=21,
                                      target_length=102, mel_layout=layout)
        params, state = models.build(cfg, jax.random.key(0))
        opt = optax.adamw(1e-3)
        step = make_train_step(cfg, opt, mixup_alpha=0.3, max_grad_norm=1.0,
                               psl_cfg=psl_cfg, psl_split=B // 2,
                               distill_classes=10,
                               spec_augment=_spec_aug(layout),
                               frontend_fn=fe, psl_frontend_fn=psl_fe)
        p, s, o, m = jax.jit(step)(params, state, opt.init(params), batch,
                                   jax.random.key(7), psl_params, psl_state)
        outs[name] = (float(m["total_loss"]), float(m["grad_norm"]), p)

    assert abs(outs["bft"][0] - outs["tfb"][0]) < 1e-5
    assert abs(outs["bft"][1] - outs["tfb"][1]) < 1e-3
    flat_b = jax.tree.leaves(outs["bft"][2])
    flat_t = jax.tree.leaves(outs["tfb"][2])
    for a, b in zip(flat_b, flat_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_psl_step_tfb_without_teacher_frontend_raises():
    from uit_mobile_tpu.train.steps import make_train_step

    cfg = models.get_model_config("uit_xxxs", outputdim=21,
                                  target_length=102, mel_layout="tfb")
    psl_cfg = models.get_model_config("MobileNetV2", outputdim=17)
    with pytest.raises(ValueError, match="psl_frontend_fn"):
        make_train_step(cfg, optax.adamw(1e-3), psl_cfg=psl_cfg,
                        psl_split=2)


def test_trainer_end_to_end_tfb(tmp_path):
    """train_from_config with model_args: {mel_layout: tfb} runs the full
    loop (loaders -> step -> validation -> checkpoints) and produces a
    finite-score averaged model."""
    from uit_mobile_tpu.data.synthworld import build_world
    from uit_mobile_tpu.train.loop import train_from_config

    config = dict(
        outputpath=str(tmp_path / "exp"),
        num_classes=537,
        model="uit_xxxs",
        model_args={"target_length": 102, "init_bn": False,
                    "mel_layout": "tfb"},
        batch_size=8, epochs=2, epoch_length=4, warmup_iters=4,
        chunk_length=1.0, optimizer="AdamW",
        optimizer_args={"lr": 7e-4}, early_stop=2, n_saved=1,
        num_workers=0, seed=0, config_stem="tfbtrain",
        **build_world(tmp_path / "world", seed=0, n_train=16, n_eval=8),
    )
    out = train_from_config(config)
    assert str(out).endswith(".npz")
    from uit_mobile_tpu.ckpt.io import load_checkpoint

    params, state, cfg, extra = load_checkpoint(out)
    assert cfg.mel_layout == "tfb"
    probs = models.apply(cfg, params, state, _wav(),
                         frontend_fn=make_frontend_fn(
                             cfg.frontend, use_pallas=False, layout="tfb"))
    assert np.isfinite(np.asarray(probs)).all()
