"""MoE UiT variant (models/moe.py) + expert parallelism (parallel/ep.py)
on the 8-virtual-device CPU platform."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from uit_mobile_tpu import models
from uit_mobile_tpu.models import moe, uit
from uit_mobile_tpu.parallel import (
    ep_param_specs,
    ep_shard_params,
    expert_parallel_forward,
    make_expert_mesh,
    make_moe_train_step,
    sharded_opt_init,
)


def _tiny(**kw):
    kw.setdefault("n_experts", 4)
    cfg = models.get_model_config("uit_xs_moe", outputdim=37,
                                  target_length=102, depth=2, **kw)
    params, state = models.build(cfg, jax.random.key(0))
    return cfg, params, state


def _wav(b, seed=0, t=16000):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1)


def test_registry_and_forward_shapes():
    cfg, params, state = _tiny()
    probs = models.apply(cfg, params, state, _wav(3))
    assert probs.shape == (3, 37)
    assert np.isfinite(np.asarray(probs)).all()
    assert (np.asarray(probs) >= 0).all() and (np.asarray(probs) <= 1).all()


def test_long_clip_crop_path():
    cfg, params, state = _tiny()
    probs = models.apply(cfg, params, state, _wav(2, t=10 * 16000))
    assert probs.shape == (2, 37)
    assert np.isfinite(np.asarray(probs)).all()


def test_all_experts_identical_matches_dense_uit():
    """With every expert holding the SAME weights, routing is a convex
    combination of identical outputs (combine weights renormalize to 1 at
    ample capacity) — the MoE forward must equal the dense UiT whose MLP
    is that weight."""
    cfg, params, state = _tiny(capacity_factor=8.0)
    dense_cfg = cfg.base
    # dense twin shares the MoE's trunk weights exactly; its MLP is expert
    # 0, which is also broadcast into every expert slot of the MoE
    dense_params = jax.tree.map(lambda a: a, params)  # deep copy
    E = cfg.n_experts
    for blk, dblk in zip(params["blocks"], dense_params["blocks"]):
        e0 = jax.tree.map(lambda a: a[0], blk["moe"])
        blk["moe"]["fc1"] = jax.tree.map(
            lambda a: jnp.stack([a[0]] * E), blk["moe"]["fc1"])
        blk["moe"]["fc2"] = jax.tree.map(
            lambda a: jnp.stack([a[0]] * E), blk["moe"]["fc2"])
        del dblk["moe"]
        dblk["mlp"] = {"fc1": e0["fc1"], "fc2": e0["fc2"]}
    wav = _wav(3, seed=1)
    got = np.asarray(models.apply(cfg, params, state, wav))
    want = np.asarray(uit.forward(dense_cfg, dense_params, state, wav))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_capacity_drops_tokens_but_stays_finite():
    cfg, params, state = _tiny(capacity_factor=0.25)
    probs = models.apply(cfg, params, state, _wav(4, seed=2))
    assert np.isfinite(np.asarray(probs)).all()


def test_dispatch_respects_capacity():
    cfg, params, state = _tiny(capacity_factor=0.5)
    b = cfg.base
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 24, b.embed_dim)),
        dtype=jnp.float32,
    )
    _, aux = moe.moe_mlp(cfg, params["blocks"][0]["moe"], x)
    assert np.isfinite(float(aux))
    # re-derive the per-group capacity from the public config
    S, E = moe._group_size(cfg, 2, 24), cfg.n_experts
    C = max(1, int(np.ceil(cfg.top_k * S / E * cfg.capacity_factor)))
    assert C < S  # the test actually constrains capacity


def test_aux_loss_uniform_router_is_one():
    """A perfectly balanced router (uniform gates) gives aux = E * E *
    (1/E)*(1/E) summed = 1 — the Switch normalization."""
    cfg, params, state = _tiny()
    blk = params["blocks"][0]["moe"]
    zeroed = dict(blk, router={"kernel": jnp.zeros_like(blk["router"]["kernel"])})
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 24, cfg.base.embed_dim)),
        dtype=jnp.float32,
    )
    _, aux = moe.moe_mlp(cfg, zeroed, x)
    # uniform gates: P_e = 1/E exactly; top-1 ties broken by index keep
    # f summing to 1 -> aux = E * sum(f/E) = 1
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)


def test_explicit_group_size():
    cfg, params, state = _tiny(group_size=24)  # one group per clip
    probs = models.apply(cfg, params, state, _wav(3, seed=9))
    assert np.isfinite(np.asarray(probs)).all()
    import pytest
    cfg_bad, params, state = _tiny(group_size=7)  # does not divide B*24
    with pytest.raises(AssertionError, match="divide"):
        models.apply(cfg_bad, params, state, _wav(3, seed=9))


def test_top1_switch_routing():
    cfg, params, state = _tiny(top_k=1)
    probs = models.apply(cfg, params, state, _wav(3, seed=8))
    assert probs.shape == (3, 37)
    assert np.isfinite(np.asarray(probs)).all()


def test_make_train_step_rejects_moe_config():
    import pytest
    from uit_mobile_tpu.train.steps import make_train_step

    cfg, _, _ = _tiny()
    with pytest.raises(TypeError, match="make_moe_train_step"):
        make_train_step(cfg, optax.adamw(1e-3))


def test_expert_parallel_forward_matches_single_device():
    cfg, params, state = _tiny()
    wav = _wav(8, seed=5)
    want = np.asarray(models.apply(cfg, params, state, wav))
    mesh = make_expert_mesh(2, 4)
    fwd = expert_parallel_forward(cfg, params, state, mesh)
    got = fwd(wav)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_ep_param_specs_shard_only_expert_banks():
    cfg, params, _ = _tiny()
    specs = ep_param_specs(params)
    blk = specs["blocks"][0]
    assert blk["moe"]["fc1"]["kernel"][0] == "expert"
    assert blk["moe"]["fc2"]["bias"][0] == "expert"
    assert blk["moe"]["router"]["kernel"] == ()  # replicated
    assert blk["attn"]["qkv"]["kernel"] == ()
    assert specs["head"]["kernel"] == ()


def test_expert_parallel_train_step():
    """One expert-parallel train step: sharded expert banks + sharded Adam
    moments; loss finite, gradients flow, loss matches the replicated
    execution of the same step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params, state = _tiny()
    opt = optax.adamw(1e-3)
    step = make_moe_train_step(cfg, opt)
    wav = _wav(8, seed=6)
    tgt = jnp.asarray(
        (np.random.default_rng(7).random((8, 37)) < 0.1).astype(np.float32))
    rng = jax.random.key(11)

    # replicated single-device reference; train-mode BN must UPDATE the
    # init_bn running stats (regression: the step used to run the eval
    # forward, freezing them at random init forever)
    opt_state0 = opt.init(params)
    _, new_state, _, want = jax.jit(step)(
        params, state, opt_state0, wav, tgt, rng)
    drift = np.abs(np.asarray(new_state["init_bn"]["mean"])
                   - np.asarray(state["init_bn"]["mean"])).max()
    assert drift > 0.0, "train step left BN running stats untouched"

    mesh = make_expert_mesh(2, 4)
    ep_params, p_sh = ep_shard_params(mesh, params)
    ep_opt, opt_sh = sharded_opt_init(opt, ep_params)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    ep_step = jax.jit(
        step,
        in_shardings=(p_sh, repl, opt_sh, data, data, repl),
        out_shardings=(p_sh, repl, opt_sh, repl),
    )
    new_params, _, _, metrics = ep_step(
        ep_params, jax.device_put(state, repl), ep_opt,
        jax.device_put(wav, data), jax.device_put(tgt, data),
        jax.device_put(rng, repl),
    )
    assert float(metrics["grad_norm"]) > 0.0
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(want["total_loss"]), atol=1e-5)
    # moments of a sharded expert bank really are sharded (ZeRO-for-EP)
    mu = ep_opt[0].mu if hasattr(ep_opt[0], "mu") else None
    if mu is not None:
        leaf = mu["blocks"][0]["moe"]["fc1"]["kernel"]
        assert len(leaf.sharding.device_set) > 1


def test_moe_bf16_compute_dtype_engages():
    """compute_dtype='bfloat16' must actually cast the MoE path (router
    stays f32): the identical-experts forward still tracks the dense bf16
    twin (regression: moe.block_forward was a drifted f32-only copy)."""
    cfg, params, state = _tiny(capacity_factor=8.0,
                               compute_dtype="bfloat16")
    E = cfg.n_experts
    dense_params = jax.tree.map(lambda a: a, params)
    for blk, dblk in zip(params["blocks"], dense_params["blocks"]):
        e0 = jax.tree.map(lambda a: a[0], blk["moe"])
        blk["moe"]["fc1"] = jax.tree.map(
            lambda a: jnp.stack([a[0]] * E), blk["moe"]["fc1"])
        blk["moe"]["fc2"] = jax.tree.map(
            lambda a: jnp.stack([a[0]] * E), blk["moe"]["fc2"])
        del dblk["moe"]
        dblk["mlp"] = {"fc1": e0["fc1"], "fc2": e0["fc2"]}
    wav = _wav(3, seed=4)
    got = np.asarray(models.apply(cfg, params, state, wav))
    want = np.asarray(uit.forward(cfg.base, dense_params, state, wav))
    np.testing.assert_allclose(got, want, atol=5e-3)  # bf16 products
    # and it must NOT be bit-identical to the f32 MoE (the cast engages)
    f32_cfg = dataclasses.replace(
        cfg, base=dataclasses.replace(cfg.base, compute_dtype="float32"))
    f32 = np.asarray(models.apply(f32_cfg, params, state, wav))
    assert np.abs(got - f32).max() > 0.0
