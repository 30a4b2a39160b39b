"""End-to-end training smoke: synthetic HDF5 -> Trainer -> checkpoints ->
averaged model -> evaluation harness. Runs on the 8-device CPU mesh."""

import numpy as np
import pandas as pd
import h5py
import pytest
import yaml


@pytest.fixture()
def synth_env(tmp_path):
    """Two tiny datasets (audioset-ish 527-550ish labels + kws) as h5+tsv."""
    rng = np.random.default_rng(0)

    def make(name, n, label_pool, lengths=(12000, 17000)):
        h5 = tmp_path / f"{name}.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(n):
                L = int(rng.integers(*lengths))
                f[f"{name}_{i}.wav"] = (rng.standard_normal(L) * 3000).astype(np.int16)
                lab = ";".join(map(str, rng.choice(label_pool, size=2, replace=False)))
                rows.append((f"{name}_{i}.wav", lab, str(h5)))
        tsv = tmp_path / f"{name}.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
            tsv, sep="\t", index=False
        )
        return tsv

    as_train = make("astrain", 16, np.arange(0, 527))
    as_eval = make("aseval", 8, np.arange(0, 527))
    kws_train = make("kwstrain", 16, np.arange(527, 537))
    kws_eval = make("kwseval", 8, np.arange(527, 537))
    return dict(
        audioset_train_data=str(as_train),
        audioset_eval_data=str(as_eval),
        kws_train_data=str(kws_train),
        kws_test_data=str(kws_eval),
    )


def base_config(tmp_path, synth_env, **overrides):
    cfg = dict(
        outputpath=str(tmp_path / "exp"),
        num_classes=537,
        model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1},
        batch_size=8,
        epochs=2,
        epoch_length=3,
        warmup_iters=2,
        chunk_length=1.0,
        optimizer="AdamW",
        optimizer_args={"lr": 1e-3, "weight_decay": 1e-8},
        early_stop=10,
        n_saved=2,
        num_workers=2,
        valid_every=1,
        seed=0,
        config_stem="smoke",
        **synth_env,
    )
    cfg.update(overrides)
    return cfg


def test_train_smoke_no_psl(tmp_path, synth_env):
    from uit_mobile_tpu.train.loop import train_from_config
    from uit_mobile_tpu.ckpt.io import load_checkpoint

    out = train_from_config(base_config(tmp_path, synth_env))
    assert out.name == "averaged.npz" and out.exists()
    params, state, cfg, extra = load_checkpoint(out)
    assert cfg.outputdim == 537
    assert "averaged_from" in extra


def test_train_smoke_with_psl_and_augment(tmp_path, synth_env):
    from uit_mobile_tpu.train.loop import train_from_config

    cfg = base_config(
        tmp_path, synth_env,
        mixup=0.3,
        max_grad_norm=1.0,
        psl={"model": "MobileNetV2", "pretrained": str(tmp_path / "missing.npz"),
             "allow_untrained": True},
        spectransforms=[{"TimeMasking": {"time_mask_param": 20}},
                        {"FrequencyMasking": {"freq_mask_param": 8}}],
        wavtransforms={"Shift": {"min_shift": -0.5, "max_shift": 0.5},
                       "Gain": {"p": 0.5}, "PolarityInversion": {"p": 0.5}},
        epochs=1, epoch_length=2,
    )
    out = train_from_config(cfg)
    assert out.exists()


def test_evaluator_on_trained_ckpt(tmp_path, synth_env):
    from uit_mobile_tpu.train.loop import train_from_config
    from uit_mobile_tpu.evaluate import Evaluator

    out = train_from_config(base_config(tmp_path, synth_env, epochs=1, epoch_length=2))
    ev = Evaluator(str(out), batch_size=8, num_workers=2)
    gsc = ev.gsc(eval_data=synth_env["kws_test_data"])
    assert 0.0 <= gsc["Accuracy@0.2"] <= 1.0
    audioset = ev.audioset(audioset_eval_data=synth_env["audioset_eval_data"])
    assert 0.0 <= audioset["mAP"] <= 1.0
    assert (out.parent / "evaluation_GSC.txt").exists()
    assert (out.parent / "evaluation_Audioset.txt").exists()


def test_train_cli_yaml(tmp_path, synth_env):
    from uit_mobile_tpu.cli.train import main

    cfg = base_config(tmp_path, synth_env, epochs=1, epoch_length=2)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = main(["train", str(cfg_path), "--epochs", "1"])
    assert rc == 0


def test_multi_step_scan_matches_sequential_steps():
    """make_multi_step: K scanned optimizer updates == K sequential
    train_step calls (same params, same metrics)."""
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu import models

    from uit_mobile_tpu.train.steps import make_multi_step, make_train_step

    cfg = models.get_model_config("uit_xxxs", outputdim=7, target_length=102,
                                  depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, max_grad_norm=1.0)
    rng = np.random.default_rng(0)
    K, B = 3, 4
    wavs = rng.standard_normal((K, B, 16000)).astype(np.float32) * 0.1
    tgts = (rng.uniform(size=(K, B, 7)) > 0.7).astype(np.float32)
    keys = jax.random.split(jax.random.key(5), K)

    # sequential
    p, s, o = params, state, opt_state
    seq_losses = []
    for i in range(K):
        p, s, o, m = jax.jit(step)(
            p, s, o, {"wav": jnp.asarray(wavs[i]), "target": jnp.asarray(tgts[i])},
            keys[i])
        seq_losses.append(float(m["total_loss"]))

    # scanned
    multi = jax.jit(make_multi_step(step))
    p2, s2, o2, ms = multi(
        params, state, opt_state,
        {"wav": jnp.asarray(wavs), "target": jnp.asarray(tgts)}, keys)
    np.testing.assert_allclose(np.asarray(ms["total_loss"]), seq_losses,
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        p, p2)


def test_train_smoke_steps_per_dispatch(tmp_path, synth_env):
    """steps_per_dispatch=2: K scanned optimizer updates per dispatched
    program (epoch_length=3 also exercises the single-step remainder)."""
    from uit_mobile_tpu.ckpt.io import load_checkpoint
    from uit_mobile_tpu.train.loop import train_from_config

    out = train_from_config(base_config(tmp_path, synth_env, epochs=1,
                                        steps_per_dispatch=2))
    assert out.exists()
    params, state, cfg, extra = load_checkpoint(out)
    assert cfg.outputdim == 537
    # train.log shows the scanned-dispatch banner and finite epoch loss
    logs = list((tmp_path / "exp").rglob("train.log"))
    assert logs and "scanned training: 2 steps" in logs[0].read_text()


def test_train_smoke_psl_steps_per_dispatch(tmp_path, synth_env):
    from uit_mobile_tpu.train.loop import train_from_config

    cfg = base_config(
        tmp_path, synth_env,
        mixup=0.3, max_grad_norm=1.0,
        psl={"model": "MobileNetV2",
             "pretrained": str(tmp_path / "missing.npz"),
             "allow_untrained": True},
        epochs=1, epoch_length=2, steps_per_dispatch=2,
    )
    out = train_from_config(cfg)
    assert out.exists()


def test_auto_resume_restarts_from_snapshot(tmp_path, synth_env, monkeypatch):
    """auto_resume: a crash after the first validation restarts the run
    from last.npz in the SAME output directory and completes."""
    from uit_mobile_tpu.train import loop as loop_mod

    real_validate = loop_mod.Trainer._validate
    calls = {"n": 0}

    def flaky_validate(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # epoch-2 eval of the first attempt
            raise RuntimeError("injected crash")
        return real_validate(self, *a, **kw)

    monkeypatch.setattr(loop_mod.Trainer, "_validate", flaky_validate)
    out = loop_mod.train_from_config(
        base_config(tmp_path, synth_env, auto_resume=1))
    assert out.exists()
    assert calls["n"] >= 3  # crashed once, resumed, finished
    # the resumed run reused the original directory (one run dir total)
    runs = list((tmp_path / "exp" / "smoke" / "uit_xxxs").iterdir())
    assert len(runs) == 1 and (runs[0] / "last.npz").exists()


def test_auto_resume_reraises_without_snapshot(tmp_path, synth_env, monkeypatch):
    """A crash before any snapshot exists must surface, not loop."""
    from uit_mobile_tpu.train import loop as loop_mod

    def always_fail(self, *a, **kw):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(loop_mod.Trainer, "_validate", always_fail)
    with pytest.raises(RuntimeError, match="injected crash"):
        loop_mod.train_from_config(
            base_config(tmp_path, synth_env, auto_resume=2))


def test_train_steps_per_dispatch_variable_length_batches(tmp_path, synth_env):
    """Full-clip loaders pad each batch to its own max; a K-group must
    equalize lengths before stacking (regression: jnp.stack used to
    raise ValueError mid-epoch on mixed-length groups)."""
    from uit_mobile_tpu.train.loop import train_from_config

    out = train_from_config(base_config(
        tmp_path, synth_env, epochs=1, epoch_length=4,
        chunk_length=None, steps_per_dispatch=2,
    ))
    assert out.exists()


def test_params_ema_transform_math():
    """chain(sgd, params_ema) tracks exactly decay*ema + (1-decay)*params
    after each update, starting from the initial params."""
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu.train.steps import find_ema_params, params_ema

    opt = optax.chain(optax.sgd(0.1), params_ema(0.9))
    params = {"w": jnp.array([1.0, 2.0]), "b": jnp.array(0.5)}
    opt_state = opt.init(params)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)),
        find_ema_params(opt_state), params))
    ema_ref = params
    for k in range(3):
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * (k + 1), params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_ref = jax.tree.map(lambda e, p: 0.9 * e + 0.1 * p, ema_ref, params)
        got = find_ema_params(opt_state)
        for ga, ra in zip(jax.tree.leaves(got), jax.tree.leaves(ema_ref)):
            np.testing.assert_allclose(ga, ra, rtol=1e-6)
    # invalid decay fails fast
    with pytest.raises(ValueError, match="decay"):
        params_ema(1.0)


def test_wrap_optimizer_grad_accum_equivalence():
    """K accumulation micro-steps == one step on the K-fold batch (SGD on
    a mean loss: MultiSteps averages the micro-gradients), and the EMA
    advances once per APPLIED update."""
    import jax
    import jax.numpy as jnp
    import optax

    from uit_mobile_tpu.train.steps import (
        find_ema_params,
        params_ema,
        wrap_optimizer,
    )

    def grad_of(params, x):
        # mean loss over the batch: grad = mean(x) * 1
        return jax.grad(lambda p: jnp.mean(p * x))(params)

    xs = [jnp.array([1.0, 3.0]), jnp.array([2.0, -1.0])]
    p0 = jnp.array(5.0)

    # accumulated: two micro-batches through MultiSteps(k=2)
    opt_a = wrap_optimizer(optax.sgd(0.5), ema_decay=0.8, grad_accum=2)
    s_a = opt_a.init(p0)
    p_a = p0
    ema_after_micro1 = None
    for i, x in enumerate(xs):
        u, s_a = opt_a.update(grad_of(p_a, x), s_a, p_a)
        p_a = optax.apply_updates(p_a, u)
        if i == 0:
            ema_after_micro1 = find_ema_params(s_a)
            assert p_a == p0  # no update applied mid-accumulation

    # reference: one step on the concatenated batch
    opt_b = optax.chain(optax.sgd(0.5), params_ema(0.8))
    s_b = opt_b.init(p0)
    u, s_b = opt_b.update(grad_of(p0, jnp.concatenate(xs)), s_b, p0)
    p_b = optax.apply_updates(p0, u)

    np.testing.assert_allclose(float(p_a), float(p_b), rtol=1e-6)
    np.testing.assert_allclose(float(find_ema_params(s_a)),
                               float(find_ema_params(s_b)), rtol=1e-6)
    # the EMA did not move during the accumulation micro-step
    np.testing.assert_allclose(float(ema_after_micro1), float(p0))


def test_train_smoke_ema_and_grad_accum(tmp_path, synth_env):
    """Trainer e2e with ema_decay + grad_accum: runs, checkpoints EMA
    weights, and resume restores the EMA from last.npz's opt_state."""
    from uit_mobile_tpu.ckpt.io import load_checkpoint, load_training_state
    from uit_mobile_tpu.train.loop import train_from_config

    cfg = base_config(tmp_path, synth_env, ema_decay=0.9, grad_accum=2,
                      epochs=2, epoch_length=4)
    out = train_from_config(cfg)
    assert out.exists()
    params, state, mcfg, extra = load_checkpoint(out)
    assert mcfg.outputdim == 537
    # last.npz carries the EMA inside opt_state: loading the training
    # state back must surface it (fresh template from the same wrappers)
    import jax
    import optax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.train.steps import (
        build_optimizer,
        find_ema_params,
        wrap_optimizer,
    )

    model_cfg = models.get_model_config(
        "uit_xxxs", outputdim=537, **cfg["model_args"])
    p0, s0 = models.build(model_cfg, jax.random.key(0))
    from uit_mobile_tpu.train.schedule import cosine_with_warmup

    opt = wrap_optimizer(
        build_optimizer("AdamW", cosine_with_warmup(1e-3, 4, 2),
                        weight_decay=1e-8),
        ema_decay=0.9, grad_accum=2)
    template = opt.init(p0)
    run_dir = next((tmp_path / "exp").glob("smoke/*/*"))
    _, _, opt_state, _, _ = load_training_state(run_dir / "last.npz",
                                                template)
    ema = find_ema_params(opt_state)
    assert ema is not None
    # EMA differs from the raw params after training (decay 0.9 lags)
    raw = load_training_state(run_dir / "last.npz", template)[0]
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(raw))]
    assert max(diffs) > 0


def test_frontend_precision_knob(tmp_path, synth_env):
    """frontend_precision: 'fast' trains end-to-end (the measured
    frontier mode); anything else fails loudly before training."""
    from uit_mobile_tpu.train.loop import train_from_config

    cfg = base_config(tmp_path, synth_env, frontend_precision="fast",
                      epochs=1, epoch_length=2)
    assert train_from_config(cfg).exists()

    import pytest as _pytest
    bad = base_config(tmp_path, synth_env, frontend_precision="speedy",
                      epochs=1, epoch_length=2)
    with _pytest.raises(ValueError, match="frontend_precision"):
        train_from_config(bad)
