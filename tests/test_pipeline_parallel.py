"""Pipeline-parallel (GPipe over a 'pipe' mesh axis) layer on the
8-virtual-device CPU platform: the microbatched collective-permute
schedule must reproduce the replicated forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.parallel import (
    make_pipe_mesh,
    pipeline_forward,
    stack_block_params,
)


def _tiny(depth=8):
    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=depth)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def _wav(b, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, 16000)).astype(np.float32) * 0.1)


def test_stack_block_params_leading_depth_axis():
    cfg, params, _ = _tiny(depth=4)
    stacked = stack_block_params(params)
    one = params["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert stacked["mlp"]["fc1"]["kernel"].shape == (4,) + one.shape
    np.testing.assert_array_equal(
        np.asarray(stacked["attn"]["qkv"]["kernel"][2]),
        np.asarray(params["blocks"][2]["attn"]["qkv"]["kernel"]),
    )


def test_pipeline_forward_matches_replicated():
    cfg, params, state = _tiny(depth=8)
    wav = _wav(8)
    want = np.asarray(models.apply(cfg, params, state, wav))
    for n_stages in (2, 4):
        mesh = make_pipe_mesh(n_stages)
        fwd = pipeline_forward(cfg, params, state, mesh)
        got = np.asarray(fwd(wav))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_pipeline_more_microbatches_than_stages():
    cfg, params, state = _tiny(depth=8)
    wav = _wav(8, seed=1)
    want = np.asarray(models.apply(cfg, params, state, wav))
    mesh = make_pipe_mesh(2)
    fwd = pipeline_forward(cfg, params, state, mesh, n_microbatches=8)
    np.testing.assert_allclose(np.asarray(fwd(wav)), want, atol=2e-5)


def test_pipeline_composes_with_data_parallel():
    cfg, params, state = _tiny(depth=8)
    wav = _wav(16, seed=2)
    want = np.asarray(models.apply(cfg, params, state, wav))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    fwd = pipeline_forward(cfg, params, state, mesh, data_axis="data")
    got = fwd(wav)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pipeline_rejects_indivisible_depth():
    cfg, params, state = _tiny(depth=8)
    mesh = make_pipe_mesh(3)
    try:
        pipeline_forward(cfg, params, state, mesh)
    except AssertionError as e:
        assert "stages" in str(e)
    else:
        raise AssertionError("depth 8 over 3 stages should be rejected")
