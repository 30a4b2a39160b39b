"""Multi-host (multi-slice) initialization helpers.

One TPU host only sees its local chips until `jax.distributed.initialize`
runs; after that, `jax.devices()` spans the full slice and the SAME mesh +
NamedSharding code in `parallel.mesh` scales across hosts (ICI within a
slice, DCN across slices — handled by the runtime, per the scaling-book
recipe). Call `initialize()` once at process start on every host.

Data loading stays per-host: `host_local_batch_slice` tells each host
which rows of the global batch to produce;
`jax.make_array_from_process_local_data` assembles the global sharded
batch.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               strict: bool = False) -> None:
    """Initialize the distributed runtime. MUST run before any backend
    use — do not query jax.devices()/process_count() first (that would
    initialize the local-only backend and break distributed init).

    ``strict=True`` (what an explicit ``multihost:`` config request sets):
    any init failure re-raises. Without it, a no-coordinator
    single-process environment is allowed to proceed un-distributed —
    but an EXPLICIT multihost request degrading silently to a
    single-host run would be the worst outcome (every host would train
    the full batch independently and believe it is rank 0).
    """
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax without is_initialized
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        if strict:
            raise RuntimeError(
                "multihost was explicitly requested but "
                "jax.distributed.initialize failed — refusing to degrade "
                "to an un-distributed run (every host would train the "
                "full batch independently as rank 0)"
            ) from e
        # best-effort mode: single-process environments with no
        # coordinator are fine; any other failure must be loud
        if num_processes in (None, 1) and coordinator_address is None:
            return
        raise


def initialize_from_config(multihost_cfg) -> None:
    """Config-key entry point (``multihost: true`` or a dict with
    ``coordinator_address`` / ``num_processes`` / ``process_id``).

    ``true`` defers to the runtime's cluster autodetection (the normal TPU
    pod case — every host runs the same command and the TPU metadata
    supplies the topology); the explicit dict form is for CPU simulation
    and bespoke clusters. Must run before any backend use — the training
    entry points call this before constructing a Trainer.
    """
    if not multihost_cfg:
        return
    kwargs = multihost_cfg if isinstance(multihost_cfg, dict) else {}
    allowed = {"coordinator_address", "num_processes", "process_id"}
    unknown = set(kwargs) - allowed
    if unknown:
        raise ValueError(f"unknown multihost config keys {sorted(unknown)}; "
                         f"allowed: {sorted(allowed)}")
    initialize(strict=True, **kwargs)


def host_local_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch this host should load."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_from_host_local(mesh, host_batch, axis: str = "data"):
    """Assemble a globally-sharded array from each host's local rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        host_batch,
    )
