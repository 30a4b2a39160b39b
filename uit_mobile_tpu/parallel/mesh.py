"""Device mesh + sharding policies.

The reference has NO distributed layer at all (single `DEVICE` constant,
reference run.py:27 — no DDP/NCCL anywhere). The TPU-idiomatic equivalent
for this model family (<=1.5M params, 24-token sequences) is pure data
parallelism: shard the batch axis over ICI, replicate the weights, and let
jit insert the gradient psum. Long-clip evaluation folds its window axis
into the batch axis first (models/uit.chunk_long_mel), so windows of one
clip may score on different chips with zero cross-chip traffic until the
final mean.

Axes:
  data  — batch-dimension DP (gradient psum over ICI rides this axis)

Multi-host: `jax.devices()` already enumerates all chips in a slice; the
same mesh + NamedSharding code is topology-agnostic (DCN handled by the
runtime).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place host arrays with the batch axis sharded over the mesh."""
    sh = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def dp_placement(shard_dims, axis: str = "data"):
    """DP mesh policy shared by the training loops (train/sed/pretrain).

    ``shard_dims`` are the batch-axis sizes the step shards (each PSL half
    shards independently). Single-host: use the largest device count that
    divides every one of them (1 device -> no mesh, plain jit). Multi-host:
    the FULL global mesh is mandatory — every process's devices must
    participate in the collective program, so indivisible batch axes are a
    loud error instead of a silently shrunk mesh.

    Returns ``(mesh, batch_sharding, replicated_sharding)`` — all ``None``
    when a single device is the right placement.
    """
    n_dev = jax.device_count()
    if jax.process_count() > 1:
        bad = [d for d in shard_dims if d % n_dev]
        if bad:
            raise ValueError(
                f"multi-host training needs every batch axis {list(shard_dims)} "
                f"divisible by the global device count ({n_dev})")
    else:
        while n_dev > 1 and any(d % n_dev for d in shard_dims):
            n_dev -= 1
    if n_dev <= 1:
        return None, None, None
    mesh = make_mesh(n_dev, axis=axis)
    return mesh, batch_sharded(mesh, axis), replicated(mesh)


def data_parallel_forward(forward_fn, mesh: Mesh | None = None, axis: str = "data",
                          manual: bool | None = None):
    """Wrap an eval forward (wav -> probs) for batch-sharded execution.

    Weights captured in the closure replicate automatically; the batch axis
    shards over the mesh and results gather on the way out (fully
    addressable). Batch sizes must divide the mesh; callers pad to the
    service batch size (serve/) or a devices-multiple (evaluate/).

    manual=False: GSPMD auto-partitioning — correct for pure-XLA
    forwards, including cross-batch reductions like the torch-mode
    batch-global top_db clamp (a collective is inserted). Mosaic/Pallas
    custom calls CANNOT be auto-partitioned — they need manual=True.

    manual=True: shard_map — the function runs per-device on its batch
    shard (the documented way to run Pallas kernels multi-device). Any
    cross-batch reduction inside becomes per-shard; only use with
    per-sample frontend semantics (serve/ defaults to per_sample).

    manual=None (default): decided from the forward's ``uses_pallas``
    attribute (set by ops/pipeline.make_forward_fn) so composing a
    Pallas forward with DP cannot silently produce the un-partitionable
    configuration.
    """
    mesh = mesh or make_mesh()
    if manual is None:
        manual = bool(getattr(forward_fn, "uses_pallas", False))
    if manual and getattr(forward_fn, "top_db_mode", None) == "torch":
        # the torch-mode dB clamp is batch-GLOBAL (a pinned parity quirk);
        # under shard_map it would silently become per-shard. Refuse here
        # — the ONE policy point — instead of trusting every caller to
        # re-implement the guard (harness/service route torch+DP through
        # the XLA frontend, where GSPMD inserts the cross-shard max).
        raise ValueError(
            "torch-mode top_db clamping is batch-global and cannot take "
            "the shard_map (manual) route — build the forward with "
            "use_pallas=False (XLA frontend, GSPMD inserts the collective) "
            "or top_db_mode='per_sample'"
        )
    if manual:
        jitted = jax.jit(
            jax.shard_map(
                forward_fn, mesh=mesh,
                in_specs=P(axis), out_specs=P(axis), check_vma=False,
            )
        )
    else:
        jitted = jax.jit(
            forward_fn,
            in_shardings=batch_sharded(mesh, axis),
            out_shardings=batch_sharded(mesh, axis),
        )

    n_axis = int(mesh.shape[axis])

    def fn(wav):
        # only the SHARDED axis's size must divide the batch — on a
        # multi-axis mesh (e.g. ('data','model')) the other axes replicate
        assert wav.shape[0] % n_axis == 0, (
            f"the '{axis}' mesh axis ({n_axis}) must divide the batch "
            f"({wav.shape[0]})"
        )
        return jitted(wav)

    return fn
