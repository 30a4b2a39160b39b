"""Expert parallelism: the MoE expert banks (models/moe.py) sharded over
an 'expert' mesh axis.

Like tp.py/pp.py/sp.py, not the production layout for the shipped dense
family (which has no experts; the reference has no distributed layer at
all, reference run.py:27) — this is the scaling path for the MoE
variant: parameter count grows linearly with n_experts while each chip
stores and computes only n_experts / n_shards expert banks.

Design — GSPMD placement, zero model-code changes, like tp.py:

The MoE blocks already compute experts as one batched einsum over a
leading (E,) axis ((E, C, D) x (E, D, H) — models/moe.moe_mlp), so
expert parallelism is purely a placement decision: shard every
``blocks.*.moe.fc1/fc2`` leaf on its expert axis (``ep_param_specs``),
replicate the router and the dense trunk, jit the SAME forward/train
step. GSPMD partitions the expert einsum over 'expert' and inserts the
all_to_all-shaped collectives at the dispatch/combine boundaries —
the TPU-idiomatic GShard formulation.

Optimizer moments inherit the placement via tp.sharded_opt_init.
Composes with data parallelism on a ('data', 'expert') mesh: the token
batch shards over 'data', expert banks over 'expert', each collective
on its own axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import moe
from .tp import make_mesh_2d, place_params, sharded_opt_init  # noqa: F401


def make_expert_mesh(n_data: int, n_expert: int,
                     axes: tuple[str, str] = ("data", "expert")) -> Mesh:
    """(n_data x n_expert) mesh; 'expert' innermost so the dispatch/
    combine all_to_alls ride adjacent ICI links."""
    return make_mesh_2d(n_data, n_expert, axes=axes)


def ep_param_specs(params, *, expert_axis: str = "expert"):
    """PartitionSpec tree: every ``moe.fc1/fc2`` leaf sharded on its
    leading (E,) axis; router + dense trunk replicated."""

    def walk(path, leaf):
        keys = tuple(
            k.key if hasattr(k, "key") else str(getattr(k, "idx", k))
            for k in path
        )
        if "moe" in keys and ("fc1" in keys or "fc2" in keys):
            return P(*((expert_axis,) + (None,) * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def ep_shard_params(mesh: Mesh, params, *, expert_axis: str = "expert"):
    """device_put ``params`` per ``ep_param_specs`` (non-divisible expert
    counts replicated); returns (sharded_params, sharding_tree)."""
    return place_params(mesh, params,
                        ep_param_specs(params, expert_axis=expert_axis))


def expert_parallel_forward(cfg, params, state, mesh: Mesh, *,
                            data_axis: str = "data",
                            expert_axis: str = "expert"):
    """Jit the MoE eval forward with expert banks sharded over
    ``mesh[expert_axis]`` and the batch over ``data_axis``."""
    params, p_sh = ep_shard_params(mesh, params, expert_axis=expert_axis)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    data = NamedSharding(mesh, P(data_axis))
    jitted = jax.jit(
        lambda p, s, w: moe.forward(cfg, p, s, w),
        in_shardings=(p_sh, repl, data), out_shardings=data,
    )
    return lambda wav: jitted(params, state, wav)


def make_moe_train_step(cfg, optimizer):
    """BCE + router-aux train step for the MoE variant:
    ``step(params, state, opt_state, wav, target, rng) ->
    (params, state, opt_state, metrics)``. Jit it with ep_shard_params /
    sharded_opt_init shardings for expert-parallel training — gradients
    of sharded expert banks reduce-scatter back to their owners.

    Runs the TRAIN-mode forward (moe.forward_with_aux train=True): the
    init_bn normalizes on batch stats and the returned ``state`` carries
    its updated running statistics (training through the eval forward
    would freeze them at their random init); ``rng`` drives the
    dropout/DropPath streams when the config enables them."""
    from ..train.steps import bce_loss  # the reference-parity clamped BCE

    def loss_fn(params, state, wav, target, rng):
        probs, aux, new_state = moe.forward_with_aux(
            cfg, params, state, wav, train=True, rng=rng)
        bce = bce_loss(probs, target)
        return bce + cfg.router_aux_weight * aux, (bce, aux, new_state)

    def step(params, state, opt_state, wav, target, rng):
        (loss, (bce, aux, state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, wav, target, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, state, opt_state, {
            "total_loss": loss, "bce": bce, "aux": aux, "grad_norm": gnorm,
        }

    return step
