"""Checkpoint save/load/average + partial pretrained loading."""

import numpy as np
import jax
import jax.numpy as jnp

from uit_mobile_tpu import models
from uit_mobile_tpu.ckpt.io import (
    save_checkpoint,
    load_checkpoint,
    average_checkpoints,
    load_pretrained_partial,
)


def test_save_load_roundtrip(tmp_path):
    cfg = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, params, state, cfg, extra={"step": 7, "mAP": 0.31})
    p2, s2, cfg2, extra = load_checkpoint(path)
    assert cfg2 == cfg
    assert extra["step"] == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # forward works on loaded params
    probs = models.apply(cfg2, p2, s2, jnp.zeros((1, 16000)))
    assert probs.shape == (1, 537)


def test_average_checkpoints(tmp_path):
    cfg = models.get_model_config("uit_xxxs", outputdim=10, target_length=102, depth=1)
    paths = []
    all_params = []
    for i in range(3):
        params, state = models.build(cfg, jax.random.key(i))
        path = tmp_path / f"best_{i}.npz"
        save_checkpoint(path, params, state, cfg)
        paths.append(path)
        all_params.append(params)
    avg_p, avg_s, cfg2, _ = average_checkpoints(paths)
    want = jax.tree.map(lambda *xs: sum(xs) / 3.0, *all_params)
    for a, b in zip(jax.tree.leaves(avg_p), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert cfg2 == cfg


def test_partial_pretrained_load():
    cfg_a = models.get_model_config("uit_xxxs", outputdim=10, target_length=102)
    cfg_b = models.get_model_config("uit_xxxs", outputdim=537, target_length=102)
    pa, _ = models.build(cfg_a, jax.random.key(0))
    pb, _ = models.build(cfg_b, jax.random.key(1))
    merged, n = load_pretrained_partial(pb, pa)
    # head shapes differ (10 vs 537) -> head keeps pb values; blocks copied
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"][0]["mlp"]["fc1"]["kernel"]),
        np.asarray(pa["blocks"][0]["mlp"]["fc1"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["head"]["kernel"]), np.asarray(pb["head"]["kernel"])
    )
    assert n > 10


def test_checkpoint_write_is_atomic_and_guards_nested_empties(tmp_path):
    """save_* writes via temp + os.replace (a crash mid-write must never
    truncate the previous good last.npz); nested empty containers refuse
    loudly (they would vanish and shift sibling list indices on load);
    an empty ROOT state round-trips (init_bn=False models)."""
    import pytest

    from uit_mobile_tpu.ckpt.io import load_checkpoint, save_checkpoint

    p = tmp_path / "ck.npz"
    params = {"blocks": [{"w": np.ones((2, 2))}, {"w": np.zeros((2, 2))}]}
    save_checkpoint(p, params, {})  # empty root state: fine
    lp, ls, _, _ = load_checkpoint(p)
    assert ls == {} and len(lp["blocks"]) == 2
    assert not list(tmp_path.glob(".*tmp*")), "temp file left behind"

    with pytest.raises(ValueError, match="empty container"):
        save_checkpoint(tmp_path / "bad.npz",
                        {"blocks": [{}, {"w": np.ones(2)}]}, {})
    # the refused write must not have clobbered anything
    assert not (tmp_path / "bad.npz").exists()
