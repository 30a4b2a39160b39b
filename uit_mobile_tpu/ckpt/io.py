"""Native checkpoint save/load + model averaging.

Format: a single ``.npz`` holding the flattened (params, state) pytrees plus
a JSON config blob — dependency-free, portable, memory-mappable. Replaces
the reference's ignite Checkpoint payload ``{'model': sd, 'config': ...}``
(run.py:340-344) and ``utils.average_models`` (utils.py:335-369).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, (dict, list, tuple)) and not tree and prefix:
        # a NESTED empty container would simply vanish from the flat form
        # and _unflatten could never rebuild it (sibling list indices
        # would shift, dict keys would silently disappear) — refuse
        # loudly. An empty ROOT tree (e.g. the stateless init_bn=False
        # models' state={}) round-trips fine: no entries -> {} on load.
        raise ValueError(
            f"cannot serialize empty container at '{prefix[:-1]}'"
        )
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            idx = sorted(int(k) for k in keys)
            if idx != list(range(len(idx))):
                raise ValueError(
                    f"non-contiguous list indices {idx} in checkpoint — "
                    f"the file is corrupt or held an empty container"
                )
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def config_to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    d["__model_config__"] = type(cfg).__name__
    return d


def config_from_dict(d: dict):
    from ..frontend import FrontendConfig
    from ..models import UITConfig, MobileNetV2Config

    d = dict(d)
    kind = d.pop("__model_config__")
    if "frontend" in d and isinstance(d["frontend"], dict):
        d["frontend"] = FrontendConfig(**d["frontend"])
    if "grid" in d:
        d.pop("grid")
    cls = {"UITConfig": UITConfig, "MobileNetV2Config": MobileNetV2Config}[kind]
    return cls(**d)


def _checkpoint_blobs(params, state, cfg, extra, **meta_extra):
    """The one flatten-to-npz-blobs serializer both checkpoint kinds share."""
    blobs = {}
    for name, tree in (("params", params), ("state", state)):
        for k, v in _flatten(tree).items():
            blobs[f"{name}{_SEP}{k}"] = v
    meta = {"config": config_to_dict(cfg) if cfg is not None else None,
            "extra": extra or {}, **meta_extra}
    blobs["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    return blobs


def _write_npz(path: Path, blobs: dict) -> None:
    """ATOMIC write: savez to a sibling temp file, then os.replace — a
    crash mid-write must never replace the previous good snapshot with a
    truncated zip (auto-resume depends on last.npz staying loadable)."""
    if not str(path).endswith(".npz"):  # mirror np.savez's appending
        path = Path(str(path) + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(f".{path.name}.tmp-{os.getpid()}.npz")
    try:
        np.savez(tmp, **blobs)
        os.replace(tmp, path)
    finally:
        tmp.unlink(missing_ok=True)


def save_checkpoint(path, params, state, cfg=None, extra: dict | None = None):
    _write_npz(Path(path), _checkpoint_blobs(params, state, cfg, extra))


def load_checkpoint(path):
    """-> (params, state, cfg_or_None, extra)."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        flat_p = {k[len("params/"):]: z[k] for k in z.files if k.startswith("params/")}
        flat_s = {k[len("state/"):]: z[k] for k in z.files if k.startswith("state/")}
    params = _unflatten(flat_p)
    state = _unflatten(flat_s)
    cfg = None
    if meta.get("config"):
        cfg = config_from_dict(meta["config"])
    return params, state, cfg, meta.get("extra", {})


def average_checkpoints(paths):
    """Element-wise average of saved checkpoints -> (params, state, cfg, extra).

    Equivalent of reference utils.average_models (utils.py:335-369): the
    final deliverable model is the mean of the best-k checkpoints.
    """
    paths = list(paths)
    assert paths, "no checkpoints to average"
    acc_p = acc_s = None
    cfg = extra = None
    for p in paths:
        params, state, cfg_i, extra_i = load_checkpoint(p)
        cfg = cfg or cfg_i
        extra = extra or extra_i
        if acc_p is None:
            acc_p, acc_s = params, state
        else:
            # accumulate ONLY float leaves; non-float leaves (counters,
            # quantized tensors) keep the first checkpoint's value — a
            # blanket sum would hand back k-times the stored value
            add = lambda a, b: a + b if jnp.issubdtype(a.dtype, jnp.floating) else a
            acc_p = jax.tree.map(add, acc_p, params)
            acc_s = jax.tree.map(add, acc_s, state)
    n = float(len(paths))
    avg = lambda a: jax.tree.map(lambda x: (x / n).astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
    return avg(acc_p), avg(acc_s), cfg, extra


def save_training_state(path, params, state, opt_state, cfg=None,
                        extra: dict | None = None):
    """Full resumable snapshot: params + BN state + OPTIMIZER state + step.

    The reference cannot resume mid-training (only best-k model weights are
    kept, no optimizer state — reference run.py:338-349); this makes
    restarts lossless. `opt_state` may be any optax pytree (NamedTuples
    included): leaves are stored by index and re-attached to a treedef
    recreated from `optimizer.init(params)` at load time.
    """
    leaves = jax.tree.leaves(opt_state)
    blobs = _checkpoint_blobs(params, state, cfg, extra,
                              n_opt_leaves=len(leaves))
    for i, leaf in enumerate(leaves):
        blobs[f"opt{_SEP}{i}"] = np.asarray(leaf)
    _write_npz(Path(path), blobs)


def load_training_state(path, opt_state_template):
    """-> (params, state, opt_state, cfg, extra). `opt_state_template` is a
    freshly-initialized optimizer state providing the treedef."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        flat_p = {k[len("params/"):]: z[k] for k in z.files if k.startswith("params/")}
        flat_s = {k[len("state/"):]: z[k] for k in z.files if k.startswith("state/")}
        n = meta["n_opt_leaves"]
        opt_leaves = [jnp.asarray(z[f"opt{_SEP}{i}"]) for i in range(n)]
    treedef = jax.tree.structure(opt_state_template)
    template_leaves = jax.tree.leaves(opt_state_template)
    assert len(template_leaves) == n, (
        f"optimizer structure changed: snapshot has {n} leaves, "
        f"current optimizer has {len(template_leaves)}"
    )
    opt_leaves = [l.astype(t.dtype) if hasattr(t, "dtype") else l
                  for l, t in zip(opt_leaves, template_leaves)]
    opt_state = jax.tree.unflatten(treedef, opt_leaves)
    cfg = config_from_dict(meta["config"]) if meta.get("config") else None
    return _unflatten(flat_p), _unflatten(flat_s), opt_state, cfg, meta.get("extra", {})


def load_pretrained_partial(params, new_params):
    """Shape-filtered partial load (reference utils.load_pretrained,
    utils.py:184-205): copy every leaf whose path+shape matches; keep the
    rest. Returns (merged, n_loaded)."""
    flat_old = _flatten(params)
    flat_new = _flatten(new_params)
    n = 0
    merged = dict(flat_old)
    for k, v in flat_new.items():
        if k in flat_old and flat_old[k].shape == v.shape:
            merged[k] = v
            n += 1
    assert n > 0, "couldn't load pretrained model (no overlapping parameters)"
    return _unflatten(merged), n
