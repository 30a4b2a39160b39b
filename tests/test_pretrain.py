"""MAE pretraining: loss decreases, snapshot transfers into fine-tuning."""

import numpy as np
import pandas as pd
import h5py
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.train import pretrain as mae


def small_mae():
    enc = models.get_model_config(
        "uit_xxxs", outputdim=537, target_length=160, depth=1
    )
    return mae.MAEConfig(encoder=enc, mask_ratio=0.75, decoder_depth=1)


def test_mae_forward_and_grads():
    cfg = small_mae()
    params, state = mae.init(cfg, jax.random.key(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 160 * 160)).astype(np.float32) * 0.1
    )

    def loss_of(p):
        loss, new_state, aux = mae.forward(cfg, p, state, wav, jax.random.key(1))
        return loss, (new_state, aux)

    (loss, (new_state, aux)), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
    assert np.isfinite(float(loss))
    # mask covers ~75% of patches
    frac = float(aux["mask"].mean())
    assert 0.6 < frac < 0.9
    # encoder AND decoder get gradients
    g_enc = float(jnp.abs(grads["blocks"][0]["mlp"]["fc1"]["kernel"]).sum())
    g_dec = float(jnp.abs(grads["mae"]["decoder_blocks"][0]["mlp"]["fc1"]["kernel"]).sum())
    assert g_enc > 0 and g_dec > 0
    # the classification head is untouched by the MAE loss
    g_head = float(jnp.abs(grads["head"]["kernel"]).sum())
    assert g_head == 0.0


def test_mae_forward_without_init_bn():
    """init_bn=False configs (GlobalNormer) must pretrain too — the BN
    branch used to KeyError on params['init_bn']."""
    enc = models.get_model_config(
        "uit_xxxs", outputdim=537, target_length=160, depth=1, init_bn=False
    )
    cfg = mae.MAEConfig(encoder=enc, mask_ratio=0.75, decoder_depth=1)
    params, state = mae.init(cfg, jax.random.key(0))
    assert "init_bn" not in params
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 160 * 160))
        .astype(np.float32) * 0.1
    )
    loss, new_state, _ = mae.forward(cfg, params, state, wav, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert new_state == state  # no BN stats to update


def test_mae_pretrain_then_finetune_transfer(tmp_path):
    rng = np.random.default_rng(0)
    h5 = tmp_path / "unlab.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(8):
            f[f"u{i}.wav"] = (rng.standard_normal(40000) * 3000).astype(np.int16)
            rows.append((f"u{i}.wav", "0", str(h5)))
    tsv = tmp_path / "unlab.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False
    )

    out = mae.pretrain_from_config(dict(
        outputpath=str(tmp_path / "exp"),
        train_data=str(tsv),
        model="uit_xxxs",
        model_args={"target_length": 160, "depth": 1},
        mask_ratio=0.75, decoder_depth=1,
        batch_size=4, epochs=1, epoch_length=2, warmup_iters=1,
        optimizer_args={"lr": 1e-4}, num_workers=1, seed=0,
    ))
    assert out.exists()

    # snapshot transfers into a fine-tuning build at a DIFFERENT
    # target_length (160 -> 102: time_pos_embed retarget path)
    from uit_mobile_tpu.train.loop import Trainer

    t = Trainer.__new__(Trainer)  # skip outputdir setup
    t.config = {
        "model": "uit_xxxs", "num_classes": 537,
        "model_args": {"target_length": 102, "depth": 1},
        "pretrained": str(out), "seed": 0,
    }
    cfg, params, state = Trainer._build_model(t)
    assert params["time_pos_embed"].shape == (6, 128)
    probs = models.apply(cfg, params, state, jnp.zeros((1, 16000)))
    assert probs.shape == (1, 537)


def test_mae_auto_resume_restarts_from_snapshot(tmp_path, monkeypatch):
    """auto_resume: a crash at the epoch-2 checkpoint write restarts from
    the epoch-1 last.npz in the deterministic output dir and completes."""
    from uit_mobile_tpu.ckpt import io as io_mod

    rng = np.random.default_rng(0)
    h5 = tmp_path / "unlab.h5"
    rows = []
    with h5py.File(h5, "w") as f:
        for i in range(6):
            f[f"u{i}.wav"] = (rng.standard_normal(30000) * 3000).astype(np.int16)
            rows.append((f"u{i}.wav", "0", str(h5)))
    tsv = tmp_path / "unlab.tsv"
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False
    )

    real_save = io_mod.save_checkpoint
    calls = {"n": 0}

    def flaky_save(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash")
        return real_save(*a, **kw)

    monkeypatch.setattr(io_mod, "save_checkpoint", flaky_save)
    out = mae.pretrain_from_config(dict(
        outputpath=str(tmp_path / "exp"), train_data=str(tsv),
        model="uit_xxxs", model_args={"target_length": 160, "depth": 1},
        mask_ratio=0.75, decoder_depth=1,
        batch_size=2, epochs=2, epoch_length=1, warmup_iters=1,
        optimizer_args={"lr": 1e-4}, num_workers=0, seed=0, auto_resume=1,
    ))
    assert out.exists()
    assert calls["n"] >= 3  # crashed once, resumed, finished
    assert (tmp_path / "exp" / "mae" / "uit_xxxs" / "last.npz").exists()
