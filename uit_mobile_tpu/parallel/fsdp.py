"""Fully-sharded data parallelism (ZeRO-3 pattern): parameters and
optimizer state sharded over the SAME axis the batch is — each chip
stores 1/N of every large tensor, XLA GSPMD all-gathers weights at use
and reduce-scatters gradients back to the owning shards.

Same positioning as tp.py/pp.py: plain DP (parallel/mesh.py) is the
production layout for the shipped <=1.5M-param family — replicating the
weights costs ~6 MB of HBM, so there is nothing to shard away. FSDP is
the scaling path for a variant whose params + Adam moments (3x params
in f32) stop fitting replicated; because the models are pure functions
over pytrees, it is — like TP — purely a placement decision:

- ``fsdp_param_specs`` shards the largest dim of every tensor >=
  ``min_size`` elements over the data axis (1-D tensors included:
  unlike Megatron-TP there is no mathematical pairing between a
  weight's sharded dim and the matmul, GSPMD re-gathers whatever the
  compute needs).
- ``fsdp_shard_params`` fits those specs to a concrete mesh (falling
  back to replicated where the axis does not divide, tp._fit_spec) and
  places the weights.
- Optimizer moments inherit the placement via tp.sharded_opt_init —
  that is where the ZeRO memory win actually lives (Adam's mu/nu are
  2x params in f32).
- The existing train step is then jitted with these in/out shardings +
  the batch over the same axis; XLA inserts all-gather (params, fwd+bwd
  remat) and reduce-scatter/psum (grads) on its own schedule.

Composes with tensor parallelism on a ('data','model') mesh —
``hybrid_param_specs`` below builds the combined placement (the
"FSDP + TP" / hybrid-sharded layout production frameworks default to
for large models): Megatron pairing over 'model' AND ZeRO-3 sharding
over 'data' on every large tensor simultaneously.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .tp import place_params, tp_param_specs


def fsdp_param_specs(params, *, axis: str = "data", min_size: int = 1024):
    """PartitionSpec tree: largest dim of each tensor >= min_size
    elements sharded over ``axis``; small tensors replicated (the
    all-gather latency would exceed their storage)."""

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0 or int(np.prod(shape)) < min_size:
            return P()
        entries = [None] * len(shape)
        entries[int(np.argmax(shape))] = axis
        return P(*entries)

    return jax.tree.map(spec, params)


def fsdp_shard_params(mesh: Mesh, params, *, axis: str = "data",
                      min_size: int = 1024):
    """device_put ``params`` per ``fsdp_param_specs`` (non-divisible dims
    replicated); returns (sharded_params, sharding_tree) — feed the tree
    to jit in_shardings/out_shardings and tp.sharded_opt_init."""
    return place_params(mesh, params,
                        fsdp_param_specs(params, axis=axis,
                                         min_size=min_size))


def hybrid_param_specs(params, *, data_axis: str = "data",
                       model_axis: str = "model", min_size: int = 1024,
                       shard_attention: bool = False):
    """FSDP x TP composition ("hybrid sharded"): start from the Megatron
    TP pairing (tp.tp_param_specs) over ``model_axis``, then ZeRO-3-shard
    every large tensor's largest still-unsharded dim over ``data_axis``.

    A TP-paired 2-D kernel ends up sharded on BOTH dims (e.g. mlp.fc1
    (D, 4D) -> P(data, model)); TP-replicated large tensors (patch embed,
    qkv/proj when shard_attention=False) get the plain FSDP largest-dim
    rule; tensors under ``min_size`` elements and TP-paired 1-D biases
    keep their TP spec. Per-param memory scales 1/(n_data*n_model), and
    the optimizer moments inherit the same placement via
    tp.sharded_opt_init. XLA GSPMD inserts the all-gathers (weights, at
    use) and reduce-scatters/psums (grads) for both axes on its own.
    """
    tp_specs = tp_param_specs(params, model_axis=model_axis,
                              shard_attention=shard_attention)

    def combine(leaf, tspec):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0 or int(np.prod(shape)) < min_size:
            return tspec
        entries = list(tspec) + [None] * (len(shape) - len(tspec))
        free = [i for i, e in enumerate(entries) if e is None]
        if free:
            entries[max(free, key=lambda i: shape[i])] = data_axis
        return P(*entries)

    return jax.tree.map(combine, params, tp_specs,
                        is_leaf=lambda x: isinstance(x, P))


def hybrid_shard_params(mesh: Mesh, params, *, data_axis: str = "data",
                        model_axis: str = "model", min_size: int = 1024,
                        shard_attention: bool = False):
    """device_put ``params`` per ``hybrid_param_specs`` fitted to ``mesh``
    (any dim an axis does not divide falls back to unsharded there);
    returns (sharded_params, sharding_tree)."""
    return place_params(mesh, params, hybrid_param_specs(
        params, data_axis=data_axis, model_axis=model_axis,
        min_size=min_size, shard_attention=shard_attention))
