"""Mid-training resume: optimizer-state round trip + Trainer resume."""

import numpy as np
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.ckpt.io import load_training_state, save_training_state
from uit_mobile_tpu.train.steps import build_optimizer


def test_training_state_roundtrip(tmp_path):
    cfg = models.get_model_config("uit_xxxs", outputdim=10, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(0))
    opt = build_optimizer("AdamW", 1e-3, weight_decay=1e-8)
    opt_state = opt.init(params)
    # take one real update so moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = opt.update(grads, opt_state, params)
    import optax

    params = optax.apply_updates(params, updates)

    path = tmp_path / "last.npz"
    save_training_state(path, params, state, opt_state, cfg,
                        extra={"epoch": 3, "step": 42})
    p2, s2, o2, cfg2, extra = load_training_state(path, opt.init(params))
    assert extra["epoch"] == 3 and cfg2 == cfg
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a further update from the restored state matches exactly
    u1, _ = opt.update(grads, opt_state, params)
    u2, _ = opt.update(grads, o2, p2)
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume(tmp_path):
    import h5py
    import pandas as pd

    from uit_mobile_tpu.train.loop import train_from_config

    rng = np.random.default_rng(0)

    def make(name, n, pool):
        h5 = tmp_path / f"{name}.h5"
        rows = []
        with h5py.File(h5, "w") as f:
            for i in range(n):
                f[f"{name}_{i}.wav"] = (rng.standard_normal(16000) * 3000).astype(np.int16)
                rows.append((f"{name}_{i}.wav", str(int(rng.choice(pool))), str(h5)))
        tsv = tmp_path / f"{name}.tsv"
        pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
            tsv, sep="\t", index=False)
        return str(tsv)

    base = dict(
        outputpath=str(tmp_path / "exp"), num_classes=537, model="uit_xxxs",
        model_args={"target_length": 102, "depth": 1}, batch_size=8,
        epochs=1, epoch_length=2, warmup_iters=1, chunk_length=1.0,
        optimizer="AdamW", optimizer_args={"lr": 1e-3}, n_saved=2,
        num_workers=1, seed=0, config_stem="resume",
        audioset_train_data=make("at", 8, np.arange(527)),
        audioset_eval_data=make("ae", 4, np.arange(527)),
        kws_train_data=make("kt", 8, np.arange(527, 537)),
        kws_test_data=make("ke", 4, np.arange(527, 537)),
    )
    out1 = train_from_config(dict(base))
    last = out1.parent / "last.npz"
    assert last.exists()

    # the snapshot carries the FULL trajectory: best-k history, patience,
    # step counter — so a resumed run's averaged.npz covers the whole run
    from uit_mobile_tpu.ckpt.io import load_checkpoint

    with np.load(last) as z:
        import json

        meta = json.loads(bytes(z["__meta__"]).decode())
    extra = meta["extra"]
    assert extra["step"] == 2  # 1 epoch x epoch_length 2
    assert "best_score" in extra and "bad_evals" in extra
    assert extra["saved"], "best-k history missing from the resume snapshot"
    for s, p in extra["saved"]:
        assert (out1.parent / __import__("pathlib").Path(p).name).exists()

    # resume for one more epoch
    out2 = train_from_config(dict(base, resume=str(last), epochs=2))
    assert out2.exists()
    # the resumed run restored the pre-crash best checkpoints: its averaged
    # deliverable must aggregate entries from BOTH stints (n_saved=2 and
    # 2 evals total -> averaged_from has 2 paths, at least one from run 1)
    _, _, _, extra2 = load_checkpoint(out2)
    averaged_from = extra2.get("averaged_from", [])
    assert averaged_from, "averaged.npz missing provenance"
    names1 = {p.name for p in out1.parent.glob("best_model_*.npz")}
    assert any(
        __import__("pathlib").Path(p).name in names1 for p in averaged_from
    ), f"resumed averaging dropped the pre-resume checkpoints: {averaged_from}"
