"""Orbax checkpoint backend round-trip: same (params, state, cfg, extra)
contract as the native .npz format."""

import numpy as np
import pytest
import jax

from uit_mobile_tpu import models

pytest.importorskip("orbax.checkpoint")


def test_orbax_round_trip(tmp_path):
    from uit_mobile_tpu.ckpt.orbax_io import load_orbax, save_orbax

    cfg = models.get_model_config("uit_xxxs", outputdim=17, target_length=102, depth=2)
    params, state = models.build(cfg, jax.random.key(0))
    out = save_orbax(tmp_path / "ckpt", params, state, cfg,
                     extra={"step": 7, "run_config": {"basename": True}})
    assert out.exists()

    p2, s2, cfg2, extra = load_orbax(tmp_path / "ckpt")
    assert cfg2 == cfg
    assert extra["step"] == 7 and extra["run_config"]["basename"] is True

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(p2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored trees drive the model identically
    import jax.numpy as jnp

    wav = jnp.zeros((1, 16000), jnp.float32)
    a = np.asarray(models.apply(cfg, params, state, wav))
    b = np.asarray(models.apply(cfg2, p2, s2, wav))
    np.testing.assert_array_equal(a, b)


def test_resolve_model_accepts_orbax_dir(tmp_path):
    from uit_mobile_tpu.ckpt.orbax_io import save_orbax
    from uit_mobile_tpu.cli.common import resolve_model

    cfg = models.get_model_config("uit_xxxs", outputdim=9, target_length=102, depth=1)
    params, state = models.build(cfg, jax.random.key(1))
    save_orbax(tmp_path / "ob", params, state, cfg,
               extra={"run_config": {"basename": True}})
    cfg2, p2, s2, extra = resolve_model(str(tmp_path / "ob"), return_extra=True)
    assert cfg2 == cfg
    assert extra["run_config"]["basename"] is True
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
