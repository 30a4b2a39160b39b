"""Deployable serving artifacts: serialized StableHLO (jax.export) archives.

The reference's deployment story is mobile-latency tables produced with
external tooling plus raw torch state_dicts (reference README.md:15-24,
inference.py:37-40); the TPU-native deployable unit is a serialized
StableHLO program: the complete wav -> probs forward — frontend, encoder,
head, sigmoid — lowered once with the weights baked in as constants and
serialized with jax.export's versioned calling convention. A ``.uitx``
file is a zip archive:

    model.stablehlo   serialized ``jax.export.Exported`` (version-stable)
    meta.json         io contract + model config + optional label map

Consumers call ``load_artifact(path)`` (any jax at or above the recorded
serialization version, on any platform the artifact lists) and get back a
plain ``fn(wav) -> probs`` — no model code from this package is needed at
serving time. Artifacts are batch-polymorphic by default (one program,
any batch size); a fixed ``batch_size`` pins the leading dim for runtimes
that want fully static shapes.

Input contract: ``(B, n_samples)`` waveforms, float32 normalized to
[-1, 1] or int16 raw PCM (chosen at export; the int16 variant folds the
1/32768 into the DFT per the package-wide int16 contract and matches the
float32 path bitwise on the XLA frontend).

Measured on the v5e: artifact probs match the in-package jitted forward
to ~1e-7 on CPU and ~8e-5 on TPU (XLA regroups the default-precision
bf16 matmul passes inside the exported module — same order as the
documented scan/layout fusion differences, well inside the 1e-3 parity
budget). Pallas (``use_pallas=True``) artifacts serialize their Mosaic
custom calls and reload correctly on TPU — verified on-chip.
"""

from __future__ import annotations

import json
import os
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp

from .io import config_to_dict

ARTIFACT_FORMAT = "uitx-v1"


def export_serving(cfg, params, state, *, batch_size=None,
                   n_samples: int = 16000, dtype: str = "float32",
                   precision: str = "exact", use_pallas: bool = False,
                   platforms=("cpu", "tpu"),
                   top_db_mode: str | None = "per_sample"):
    """Lower the eval wav->probs forward to a ``jax.export.Exported``.

    batch_size None -> batch-polymorphic ("b"); int -> fixed leading dim.
    dtype 'float32' (normalized wavs) or 'int16' (raw PCM).
    use_pallas=True emits the Mosaic-kernel frontend — TPU-only custom
    calls, so ``platforms`` must then be exactly ('tpu',). The default
    XLA-op frontend lowers portably for every listed platform.
    """
    from jax import export as jexport

    from ..ops.pipeline import make_forward_fn

    platforms = tuple(platforms)
    if use_pallas and platforms != ("tpu",):
        raise ValueError(
            "use_pallas=True artifacts carry Mosaic custom calls — "
            f"platforms must be ('tpu',), got {platforms}"
        )
    if use_pallas and batch_size is None:
        raise ValueError(
            "use_pallas=True artifacts need a fixed batch_size: the "
            "Mosaic kernel grid (and the small-batch row-kernel routing) "
            "depends on the concrete batch dim"
        )
    if dtype not in ("float32", "int16"):
        raise ValueError(f"dtype must be 'float32' or 'int16', got {dtype!r}")
    fwd = make_forward_fn(cfg, params, state, use_pallas=use_pallas,
                          precision=precision, top_db_mode=top_db_mode)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct(
        (b, int(n_samples)),
        jnp.int16 if dtype == "int16" else jnp.float32,
    )
    return jexport.export(jax.jit(fwd), platforms=list(platforms))(spec)


def save_artifact(path, exported, cfg=None, labels=None,
                  extra: dict | None = None) -> Path:
    """Write an Exported + metadata as a ``.uitx`` zip (atomically)."""
    path = Path(path)
    in_aval = exported.in_avals[0]
    meta = {
        "format": ARTIFACT_FORMAT,
        "input_shape": [str(d) for d in in_aval.shape],
        "input_dtype": str(in_aval.dtype),
        "output_shape": [str(d) for d in exported.out_avals[0].shape],
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "config": config_to_dict(cfg) if cfg is not None else None,
        "labels": labels,
        "extra": extra or {},
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(f".{path.name}.tmp-{os.getpid()}")
    try:
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("model.stablehlo", bytes(exported.serialize()))
            z.writestr("meta.json", json.dumps(meta, indent=1))
        os.replace(tmp, path)
    finally:
        tmp.unlink(missing_ok=True)
    return path


def load_artifact(path):
    """-> (fn, meta): ``fn(wav) -> probs`` on the current jax backend.

    Needs only jax (the platform must be one the artifact was exported
    for) — none of this package's model code runs at call time.
    """
    from jax import export as jexport

    with zipfile.ZipFile(Path(path)) as z:
        blob = z.read("model.stablehlo")
        meta = json.loads(z.read("meta.json").decode())
    if meta.get("format") != ARTIFACT_FORMAT:
        raise ValueError(f"not a {ARTIFACT_FORMAT} artifact: {path}")
    exported = jexport.deserialize(bytearray(blob))
    return exported.call, meta
