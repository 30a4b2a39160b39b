"""Distillation variants beyond the reference's PSL.

'soft' mode: any registered teacher (e.g. a trained UiT — self-
distillation) scores the FULL batch; targets become a convex mix of
teacher probabilities and ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from uit_mobile_tpu import models
from uit_mobile_tpu.train.steps import make_train_step


def _batch(rng, n=4, C=537):
    def half():
        return {
            "wav": jnp.asarray(rng.standard_normal((n, 16000)).astype(np.float32) * 0.1),
            "target": jnp.asarray((rng.random((n, C)) < 0.02).astype(np.float32)),
        }
    return {"audioset": half(), "kws": half()}


@pytest.fixture(scope="module")
def student():
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_soft_distillation_with_uit_teacher(student):
    """Self-distillation: a UiT teacher with the student's outputdim."""
    cfg, params, state = student
    t_cfg = models.get_model_config("uit_xxxs", outputdim=537,
                                    target_length=102, depth=1)
    t_params, t_state = models.build(t_cfg, jax.random.key(9))
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, psl_cfg=t_cfg, distill_mode="soft",
                           distill_alpha=0.5)
    rng = np.random.default_rng(0)
    p, s, o, m = step(params, state, opt.init(params), _batch(rng),
                      jax.random.key(1), t_params, t_state)
    assert np.isfinite(float(m["total_loss"])) and float(m["grad_norm"]) > 0


def test_soft_alpha_zero_matches_pure_ground_truth(student):
    """alpha=0: the teacher contributes nothing — identical update to a
    teacherless step on the concatenated batch."""
    cfg, params, state = student
    t_cfg = models.get_model_config("MobileNetV2", outputdim=537)
    t_params, t_state = models.build(t_cfg, jax.random.key(9))
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    key = jax.random.key(2)

    soft = make_train_step(cfg, opt, psl_cfg=t_cfg, distill_mode="soft",
                           distill_alpha=0.0)
    p_a, _, _, m_a = soft(params, state, opt.init(params), batch, key,
                          t_params, t_state)
    plain = make_train_step(cfg, opt)
    flat = {
        "wav": jnp.concatenate([batch["audioset"]["wav"], batch["kws"]["wav"]]),
        "target": jnp.concatenate([batch["audioset"]["target"],
                                   batch["kws"]["target"]]),
    }
    p_b, _, _, m_b = plain(params, state, opt.init(params), flat, key)
    assert float(m_a["total_loss"]) == pytest.approx(float(m_b["total_loss"]),
                                                     abs=1e-7)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_psl_mode_unchanged_by_default(student):
    """The reference-semantics path: teacher scores the audioset half only
    and overwrites its first 527 columns; KWS targets untouched."""
    cfg, params, state = student
    t_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    t_params, t_state = models.build(t_cfg, jax.random.key(3))
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt, psl_cfg=t_cfg)
    rng = np.random.default_rng(2)
    p, s, o, m = step(params, state, opt.init(params), _batch(rng),
                      jax.random.key(4), t_params, t_state)
    assert np.isfinite(float(m["total_loss"]))


def test_preassembled_psl_batch_matches_dict_batch(student):
    """The Trainer's flat [audioset, kws] batch (psl_split fast path) must
    produce the same update as the dict-batch path — the speedup is pure
    assembly placement, not math."""
    cfg, params, state = student
    t_cfg = models.get_model_config("MobileNetV2", outputdim=527)
    t_params, t_state = models.build(t_cfg, jax.random.key(3))
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(7)
    batch = _batch(rng)
    key = jax.random.key(8)
    n_as = batch["audioset"]["wav"].shape[0]

    dict_step = make_train_step(cfg, opt, psl_cfg=t_cfg, mixup_alpha=0.3)
    p_a, _, _, m_a = dict_step(params, state, opt.init(params), batch, key,
                               t_params, t_state)

    flat = {
        "wav": jnp.concatenate([batch["audioset"]["wav"],
                                batch["kws"]["wav"]]),
        "target": jnp.concatenate([batch["audioset"]["target"],
                                   batch["kws"]["target"]]),
    }
    flat_step = make_train_step(cfg, opt, psl_cfg=t_cfg, mixup_alpha=0.3,
                                psl_split=n_as)
    p_b, _, _, m_b = flat_step(params, state, opt.init(params), flat, key,
                               t_params, t_state)
    assert float(m_a["total_loss"]) == pytest.approx(float(m_b["total_loss"]),
                                                     abs=1e-6)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_a),
        jax.tree_util.tree_leaves_with_path(p_b),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_preassembled_soft_mode_matches_dict_batch(student):
    """Soft distillation through the flat path: teacher scores the whole
    batch, convex mix unchanged."""
    cfg, params, state = student
    t_cfg = models.get_model_config("uit_xxxs", outputdim=537,
                                    target_length=102, depth=1)
    t_params, t_state = models.build(t_cfg, jax.random.key(9))
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(11)
    batch = _batch(rng)
    key = jax.random.key(12)

    kw = dict(psl_cfg=t_cfg, distill_mode="soft", distill_alpha=0.5)
    p_a, _, _, m_a = make_train_step(cfg, opt, **kw)(
        params, state, opt.init(params), batch, key, t_params, t_state)
    flat = {
        "wav": jnp.concatenate([batch["audioset"]["wav"],
                                batch["kws"]["wav"]]),
        "target": jnp.concatenate([batch["audioset"]["target"],
                                   batch["kws"]["target"]]),
    }
    p_b, _, _, m_b = make_train_step(cfg, opt, psl_split=4, **kw)(
        params, state, opt.init(params), flat, key, t_params, t_state)
    assert float(m_a["total_loss"]) == pytest.approx(float(m_b["total_loss"]),
                                                     abs=1e-6)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_passes_soft_mode(tmp_path):
    """Config plumbing: psl.mode/alpha/outputdim reach the step (smoke via
    train_from_config with an untrained same-family teacher)."""
    import pandas as pd
    import h5py
    from uit_mobile_tpu.train.loop import train_from_config

    rng = np.random.default_rng(0)
    h5 = tmp_path / "d.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(8):
            f[f"c_{i}.wav"] = (rng.standard_normal(16000) * 2000).astype(np.int16)
            rows.append((f"c_{i}.wav", str(i % 537), str(h5)))
    tsv = tmp_path / "d.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    out = train_from_config(dict(
        outputpath=str(tmp_path / "exp"), num_classes=537, model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1}, batch_size=4,
        epochs=1, epoch_length=2, warmup_iters=1, chunk_length=1.0,
        optimizer="AdamW", optimizer_args={"lr": 1e-3}, n_saved=1,
        num_workers=0, valid_every=1, seed=0, config_stem="soft-distill",
        audioset_train_data=str(tsv), audioset_eval_data=str(tsv),
        kws_train_data=str(tsv), kws_test_data=str(tsv), basename=False,
        psl={"model": "uit_xxxs", "pretrained": "missing.npz",
             "allow_untrained": True, "outputdim": 537,
             "mode": "soft", "alpha": 0.5},
    ))
    assert out.exists()
