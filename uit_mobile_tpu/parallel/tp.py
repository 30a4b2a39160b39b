"""Tensor parallelism: 2D (data x model) sharding for the UiT family.

Pure data parallelism is the PRODUCTION layout for this model family
(parallel/mesh.py — <=1.5M params, 24-token sequences; the reference has
no distributed layer at all, reference run.py:27). This module exists so
the same framework scales past that regime: a hypothetical uit_base/
large (D >= 768, mlp hidden >= 3072) or a giant output head stops
fitting comfortably replicated, and the batch-per-chip floor of DP
(B >= n_devices) binds at high device counts. Tensor parallelism shards
the WEIGHTS over a second mesh axis so those models run unchanged.

Design — GSPMD, Megatron-pattern, zero model-code changes:

The models are pure functions over parameter pytrees, so tensor
parallelism is purely a placement decision: build a PartitionSpec tree
parallel to ``params`` (``tp_param_specs``), ``jax.device_put`` the
weights with it, and jit the SAME forward/train-step. XLA GSPMD
propagates the shardings through every matmul and inserts the
collectives (psum after row-sharded matmuls) on its own — the
TPU-idiomatic formulation of Megatron TP (shard column dim of the
up-projection, row dim of the down-projection, one all-reduce per
block):

- ``mlp.fc1``: kernel P(None, model), bias P(model)  [column-sharded]
- ``mlp.fc2``: kernel P(model, None), bias P()       [row-sharded]
- ``head``:    kernel P(None, model), bias P(model)  [class-sharded]
- attention (``shard_attention=True`` only): qkv P(None, model) /
  proj P(model, None). OFF by default: at N=24 tokens and
  inner_dim=D/4, the per-head tensors are so small that the resharding
  GSPMD inserts around the packed-[q|k|v] split costs more than the
  matmuls it parallelizes. The switch exists (and is tested) because a
  large-D variant flips that verdict.
- everything else (LN, BN, pos embeds, patch embed, cls token): P() —
  replicated; these are O(D) or O(P*D) bytes.

Optimizer state: initialize it UNDER jit from already-sharded params
(``sharded_opt_init``) and the moments inherit each parameter's
sharding automatically — weight-update sharding with no per-optimizer
spec table.

Not implemented, by design (document > stub): pipeline parallelism
(12 blocks x ~100k params gives no stage worth a bubble), sequence
parallelism (N=24 tokens), expert parallelism (no MoE in the family).
The mesh axes here compose with multi-host DP (parallel/multihost.py)
unchanged — 'data' spans hosts over DCN, 'model' stays intra-slice on
ICI, which is the layout the collectives want.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int,
                 axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """(n_data x n_model) mesh. Axis order puts 'model' innermost —
    adjacent devices on the ICI ring carry the per-block psum traffic,
    'data' (gradient psum once per step) rides the outer dimension."""
    devices = jax.devices()
    need = n_data * n_model
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, axes)


def _spec_for(path_keys: tuple[str, ...], leaf, model_axis: str,
              shard_attention: bool) -> P:
    ndim = getattr(leaf, "ndim", 0)
    ks = path_keys

    def col():  # output-dim sharded
        return P(None, model_axis) if ndim == 2 else P(model_axis)

    def row():  # input-dim sharded; 1-D bias stays replicated (added
        return P(model_axis, None) if ndim == 2 else P()  # after the psum)

    if "mlp" in ks and "fc1" in ks:
        return col()
    if "mlp" in ks and "fc2" in ks:
        return row()
    if "head" in ks and "head_norm" not in ks:
        return col()
    if shard_attention and "attn" in ks and "qkv" in ks:
        return col()
    if shard_attention and "attn" in ks and "proj" in ks:
        return row()
    return P()


def tp_param_specs(params, *, model_axis: str = "model",
                   shard_attention: bool = False):
    """PartitionSpec pytree parallel to ``params`` (rules above).

    Purely structural — no mesh needed. ``shard_params`` fits these to a
    concrete mesh: explicit input shardings (device_put / jit
    in_shardings) must divide evenly, so any dim a mesh axis does not
    divide falls back to replicated there (e.g. a 37-class head over
    model=2 stays whole; Megatron pads the vocab instead — we keep the
    checkpoint layout byte-stable and replicate)."""

    def walk(path, leaf):
        # same extractor as sharded_opt_init's suffix matching — the two
        # MUST agree or moments silently fall back to replicated
        return _spec_for(_path_keys(path), leaf, model_axis,
                         shard_attention)

    return jax.tree_util.tree_map_with_path(walk, params)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop any sharded dim the mesh axis does not divide evenly —
    explicit input shardings (unlike GSPMD-propagated intermediates)
    refuse uneven partitions."""
    fitted = []
    for i, axis in enumerate(spec):
        if axis is not None and shape[i] % mesh.shape[axis] != 0:
            axis = None
        fitted.append(axis)
    return P(*fitted)


def place_params(mesh: Mesh, params, specs):
    """NamedShardings from per-leaf PartitionSpecs (non-divisible dims
    replicated, see ``_fit_spec``) + device_put; returns
    (sharded_params, sharding_tree) — the tree doubles as the jit
    in_shardings entry. Shared by the TP/FSDP/hybrid placers."""
    shardings = jax.tree.map(
        lambda leaf, s: NamedSharding(mesh, _fit_spec(s, leaf.shape, mesh)),
        params, specs, is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings), shardings


def shard_params(mesh: Mesh, params, *, model_axis: str = "model",
                 shard_attention: bool = False):
    """device_put ``params`` per ``tp_param_specs``; see place_params."""
    return place_params(mesh, params,
                        tp_param_specs(params, model_axis=model_axis,
                                       shard_attention=shard_attention))


def _path_keys(path) -> tuple[str, ...]:
    return tuple(
        k.key if hasattr(k, "key")
        else k.name if hasattr(k, "name")
        else str(getattr(k, "idx", k))
        for k in path
    )


def sharded_opt_init(optimizer, sharded_params):
    """optimizer.init with moment tensors placed like their parameters
    (weight-update sharding). GSPMD can NOT infer this on its own:
    ``zeros_like(p)`` has no data dependence on ``p``, so a bare
    ``jit(init)`` returns unsharded moments. Instead we eval_shape the
    state, match each leaf back to its parameter by path suffix
    (optax moment trees mirror the params pytree under a NamedTuple
    field) + exact shape, and jit with explicit out_shardings. Leaves
    without a same-shape parameter twin (step counts, adafactor's
    factored row/col moments) stay replicated. Returns
    (opt_state, sharding_tree)."""
    by_path: dict[tuple[str, ...], tuple] = {}
    sample = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(sharded_params):
        by_path[_path_keys(path)] = (leaf.sharding, tuple(leaf.shape))
        sample = leaf.sharding
    repl = NamedSharding(sample.mesh, P())

    def pick(path, leaf):
        keys = _path_keys(path)
        shape = tuple(leaf.shape)
        for i in range(len(keys)):
            hit = by_path.get(keys[i:])
            if hit is not None and hit[1] == shape:
                return hit[0]
        return repl

    abstract = jax.eval_shape(optimizer.init, sharded_params)
    out_sh = jax.tree_util.tree_map_with_path(pick, abstract)
    opt_state = jax.jit(optimizer.init, out_shardings=out_sh)(sharded_params)
    return opt_state, out_sh


def tensor_parallel_forward(apply_fn, mesh: Mesh, params, state, *,
                            data_axis: str = "data",
                            model_axis: str = "model",
                            shard_attention: bool = False):
    """Jit an eval forward ``apply_fn(params, state, wav) -> probs`` with
    Megatron-sharded weights + batch-sharded inputs over a 2D mesh.

    Uses the pure-XLA frontend path only — Mosaic custom calls cannot be
    GSPMD-partitioned over the model axis (the Pallas frontend runs
    under DP via shard_map instead, see parallel/mesh.py)."""
    params, p_sh = shard_params(mesh, params, model_axis=model_axis,
                                shard_attention=shard_attention)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    data = NamedSharding(mesh, P(data_axis))
    jitted = jax.jit(apply_fn, in_shardings=(p_sh, repl, data),
                     out_shardings=data)

    n_batch = mesh.shape[data_axis]

    def fn(wav):
        assert wav.shape[0] % n_batch == 0, (
            f"the '{data_axis}' axis ({n_batch}) must divide the batch "
            f"({wav.shape[0]})"
        )
        return jitted(params, state, wav)

    return fn
