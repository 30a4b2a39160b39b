"""FSDP (ZeRO-3 pattern) on the 8-virtual-device CPU platform: params +
optimizer moments sharded over the data axis must train identically to
the single-device step, with the memory-bearing tensors actually
distributed."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.parallel import (
    fsdp_param_specs,
    fsdp_shard_params,
    make_mesh,
    sharded_opt_init,
)


def _tiny():
    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=2)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_fsdp_specs_shard_largest_dim_of_large_tensors():
    _, params, _ = _tiny()
    specs = fsdp_param_specs(params, min_size=1024)
    fc1 = params["blocks"][0]["mlp"]["fc1"]["kernel"]   # (D, 4D): dim 1
    assert specs["blocks"][0]["mlp"]["fc1"]["kernel"] == P(None, "data")
    assert fc1.shape[1] > fc1.shape[0]
    # small tensors replicated
    assert specs["blocks"][0]["norm1"]["scale"] == P()
    assert specs["cls_token"] == P()


def test_fsdp_train_step_matches_single_device():
    from uit_mobile_tpu.train import make_train_step
    from uit_mobile_tpu.train.steps import build_optimizer

    cfg, params, state = _tiny()
    optimizer = build_optimizer("AdamW", 1e-3, weight_decay=1e-8)
    step = make_train_step(cfg, optimizer)
    rng = np.random.default_rng(3)
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((16, 16000)).astype(np.float32) * 0.1
        ),
        "target": jnp.asarray((rng.random((16, 37)) < 0.1).astype(np.float32)),
    }
    key = jax.random.key(11)

    opt_state = optimizer.init(params)
    ref_params, _, _, ref_metrics = jax.jit(step)(
        params, state, opt_state, batch, key
    )

    mesh = make_mesh(8)  # the standard 1-D 'data' mesh
    sh_params, p_sh = fsdp_shard_params(mesh, params)
    # the big tensors are genuinely distributed, not replicated
    fc1 = sh_params["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "data")
    sh_opt, opt_sh = sharded_opt_init(optimizer, sh_params)
    assert (
        sh_opt[0].mu["blocks"][0]["mlp"]["fc1"]["kernel"].sharding.spec
        == P(None, "data")
    )

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    fsdp_step = jax.jit(
        step,
        in_shardings=(p_sh, repl, opt_sh, data, repl),
        out_shardings=(p_sh, repl, opt_sh, repl),
    )
    new_params, _, _, metrics = fsdp_step(
        sh_params, jax.device_put(state, repl), sh_opt,
        jax.device_put(batch, data), key,
    )
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(ref_metrics["total_loss"]),
        rtol=1e-5,
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_params),
        jax.tree_util.tree_leaves_with_path(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5,
            err_msg=jax.tree_util.keystr(kp),
        )
    assert new_params["blocks"][0]["mlp"]["fc1"]["kernel"].sharding.spec == \
        P(None, "data")
