"""Optional Orbax checkpoint backend.

The primary format stays the dependency-free ``.npz`` (ckpt/io.py) — it is
what the trainer, evaluator and CLI write and resolve. This module offers
the idiomatic JAX-ecosystem alternative for users whose infrastructure
standardizes on Orbax (async multi-host saves, cloud storage drivers,
sharding-aware restore): the same (params, state, cfg, extra) contract,
stored as an Orbax PyTree checkpoint with the config/extra in a JSON
metadata entry.

Usage:
    from uit_mobile_tpu.ckpt.orbax_io import save_orbax, load_orbax
    save_orbax(dir, params, state, cfg, extra={"step": 1000})
    params, state, cfg, extra = load_orbax(dir)
"""

from __future__ import annotations

import json
from pathlib import Path

from .io import config_from_dict, config_to_dict


def save_orbax(path, params, state, cfg=None, extra: dict | None = None) -> Path:
    """Write an Orbax checkpoint directory at `path` (created/overwritten)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    payload = {"params": params, "state": state}
    meta = {
        "config": config_to_dict(cfg) if cfg is not None else None,
        "extra": extra or {},
    }
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(
            path,
            args=ocp.args.Composite(
                tree=ocp.args.PyTreeSave(payload),
                meta=ocp.args.JsonSave(meta),
            ),
            force=True,
        )
    return path


def load_orbax(path):
    """-> (params, state, cfg_or_None, extra) from an Orbax directory."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(
            path,
            args=ocp.args.Composite(
                tree=ocp.args.PyTreeRestore(),
                meta=ocp.args.JsonRestore(),
            ),
        )
    tree = restored["tree"]
    meta = restored["meta"] or {}
    cfg = config_from_dict(meta["config"]) if meta.get("config") else None
    return tree["params"], tree["state"], cfg, meta.get("extra", {})
