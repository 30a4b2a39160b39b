"""Tensor-parallel (2D data x model) layer on the 8-virtual-device CPU
platform: Megatron-sharded weights must be numerically equivalent to the
replicated execution, for eval forwards and the full train step."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.parallel import (
    make_mesh_2d,
    shard_params,
    sharded_opt_init,
    tensor_parallel_forward,
    tp_param_specs,
)


def _tiny():
    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=2)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_mesh_2d_shape_and_axes():
    mesh = make_mesh_2d(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh.devices.size == 8


def test_param_specs_follow_megatron_pattern():
    _, params, _ = _tiny()
    specs = tp_param_specs(params)
    b0 = specs["blocks"][0]
    assert b0["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert b0["mlp"]["fc1"]["bias"] == P("model")
    assert b0["mlp"]["fc2"]["kernel"] == P("model", None)
    assert b0["mlp"]["fc2"]["bias"] == P()
    assert specs["head"]["kernel"] == P(None, "model")
    # attention replicated by default; sharded only on request
    assert b0["attn"]["qkv"]["kernel"] == P()
    with_attn = tp_param_specs(params, shard_attention=True)
    assert with_attn["blocks"][0]["attn"]["qkv"]["kernel"] == P(None, "model")
    assert with_attn["blocks"][0]["attn"]["proj"]["kernel"] == P("model", None)
    # norms / embeds stay replicated either way
    assert with_attn["head_norm"]["scale"] == P()
    assert with_attn["patch_embed"]["kernel"] == P()


def test_tp_forward_matches_replicated():
    cfg, params, state = _tiny()
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((16, 16000)).astype(np.float32)
        * 0.1
    )
    want = np.asarray(models.apply(cfg, params, state, wav))
    for n_data, n_model, shard_attn in ((4, 2, False), (2, 4, False),
                                        (4, 2, True)):
        mesh = make_mesh_2d(n_data, n_model)
        fwd = tensor_parallel_forward(
            lambda p, s, w: models.apply(cfg, p, s, w), mesh, params, state,
            shard_attention=shard_attn,
        )
        got = fwd(wav)
        assert len(got.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_sharded_opt_state_inherits_param_sharding():
    import optax

    _, params, _ = _tiny()
    mesh = make_mesh_2d(4, 2)
    sh_params, p_sh = shard_params(mesh, params)
    opt = optax.adamw(1e-3, weight_decay=1e-8)
    opt_state, opt_sh = sharded_opt_init(opt, sh_params)
    # AdamW moments mirror the params pytree: fc1 kernel's mu must carry
    # the same Megatron sharding as the weight itself
    mu_fc1 = opt_state[0].mu["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert mu_fc1.sharding.spec == P(None, "model")
    mu_fc2 = opt_state[0].mu["blocks"][0]["mlp"]["fc2"]["kernel"]
    assert mu_fc2.sharding.spec == P("model", None)


def test_tp_train_step_matches_single_device():
    from uit_mobile_tpu.train import make_train_step
    from uit_mobile_tpu.train.steps import build_optimizer

    cfg, params, state = _tiny()
    optimizer = build_optimizer("AdamW", 1e-3, weight_decay=1e-8)
    step = make_train_step(cfg, optimizer)
    rng = np.random.default_rng(2)
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((16, 16000)).astype(np.float32) * 0.1
        ),
        "target": jnp.asarray((rng.random((16, 37)) < 0.1).astype(np.float32)),
    }
    key = jax.random.key(7)

    opt_state = optimizer.init(params)
    ref_params, ref_state, ref_opt, ref_metrics = jax.jit(step)(
        params, state, opt_state, batch, key
    )

    mesh = make_mesh_2d(4, 2)
    sh_params, p_sh = shard_params(mesh, params)
    sh_opt, opt_sh = sharded_opt_init(optimizer, sh_params)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    sh_state = jax.device_put(state, repl)
    sh_batch = jax.device_put(batch, data)
    tp_step = jax.jit(
        step,
        in_shardings=(p_sh, repl, opt_sh, data, repl),
        out_shardings=(p_sh, repl, opt_sh, repl),
    )
    new_params, new_state, new_opt, metrics = tp_step(
        sh_params, sh_state, sh_opt, sh_batch, key
    )

    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(ref_metrics["total_loss"]),
        rtol=1e-5,
    )
    # updated weights agree leaf-by-leaf with the single-device step
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_params),
        jax.tree_util.tree_leaves_with_path(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(kp),
        )
    # ...and the sharded weights kept their Megatron placement
    fc1 = new_params["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "model")
