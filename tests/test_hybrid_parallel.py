"""Hybrid FSDP x TP ("hybrid sharded") on a (4 data, 2 model) mesh:
Megatron pairing over 'model' composed with ZeRO-3 sharding over 'data'
on the same tensors. The unchanged train step jitted under the combined
placement must match the single-device step; the memory-bearing kernels
must be sharded on BOTH mesh axes."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uit_mobile_tpu import models
from uit_mobile_tpu.parallel import (
    hybrid_param_specs,
    hybrid_shard_params,
    make_mesh_2d,
    sharded_opt_init,
)


def _tiny():
    cfg = models.get_model_config("uit_xxxs", outputdim=37,
                                  target_length=102, depth=2)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def test_hybrid_specs_combine_tp_and_fsdp():
    _, params, _ = _tiny()
    specs = hybrid_param_specs(params, min_size=1024)
    blk = specs["blocks"][0]
    # Megatron-paired kernels gain the data axis on their free dim
    assert blk["mlp"]["fc1"]["kernel"] == P("data", "model")   # (D, 4D) col
    assert blk["mlp"]["fc2"]["kernel"] == P("model", "data")   # (4D, D) row
    assert specs["head"]["kernel"] == P("data", "model")
    # TP-paired 1-D biases keep the TP spec (no dim left to shard)
    assert blk["mlp"]["fc1"]["bias"] == P("model")
    # TP-replicated large tensors fall back to the FSDP largest-dim rule
    assert specs["patch_embed"]["kernel"] == P("data", None)   # (2F, D)
    assert blk["attn"]["qkv"]["kernel"] == P("data", None)     # (D, 3*D/4)
    assert blk["attn"]["proj"]["kernel"] == P(None, "data")    # (D/4, D)
    # small tensors stay replicated
    assert specs["cls_token"] == P()
    assert blk["norm1"]["scale"] == P()


def test_hybrid_specs_shard_attention_keeps_tp_pairing():
    _, params, _ = _tiny()
    specs = hybrid_param_specs(params, min_size=1024, shard_attention=True)
    blk = specs["blocks"][0]
    assert blk["attn"]["qkv"]["kernel"] == P("data", "model")
    assert blk["attn"]["proj"]["kernel"] == P("model", "data")


def test_hybrid_train_step_matches_single_device():
    from uit_mobile_tpu.train import make_train_step
    from uit_mobile_tpu.train.steps import build_optimizer

    cfg, params, state = _tiny()
    optimizer = build_optimizer("AdamW", 1e-3, weight_decay=1e-8)
    step = make_train_step(cfg, optimizer)
    rng = np.random.default_rng(5)
    batch = {
        "wav": jnp.asarray(
            rng.standard_normal((16, 16000)).astype(np.float32) * 0.1
        ),
        "target": jnp.asarray((rng.random((16, 37)) < 0.1).astype(np.float32)),
    }
    key = jax.random.key(13)

    opt_state = optimizer.init(params)
    ref_params, _, _, ref_metrics = jax.jit(step)(
        params, state, opt_state, batch, key
    )

    mesh = make_mesh_2d(4, 2)
    sh_params, p_sh = hybrid_shard_params(mesh, params)
    fc1 = sh_params["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P("data", "model")  # both axes, for real
    # head (128, 37): model does not divide 37 -> fitted to data-only
    assert sh_params["head"]["kernel"].sharding.spec == P("data", None)
    sh_opt, opt_sh = sharded_opt_init(optimizer, sh_params)
    assert (
        sh_opt[0].mu["blocks"][0]["mlp"]["fc1"]["kernel"].sharding.spec
        == P("data", "model")
    )

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    hyb_step = jax.jit(
        step,
        in_shardings=(p_sh, repl, opt_sh, data, repl),
        out_shardings=(p_sh, repl, opt_sh, repl),
    )
    new_params, _, _, metrics = hyb_step(
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
        # two collective axes => slightly more reduction-order noise
        # than the FSDP-only test's 3e-5
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=jax.tree_util.keystr(kp),
        )
    assert new_params["blocks"][0]["mlp"]["fc1"]["kernel"].sharding.spec == \
        P("data", "model")
