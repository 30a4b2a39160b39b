"""YAML + CLI-override config system.

Same merge shape as the reference (utils.py:209-222): YAML keys, overridden
by CLI ``--key value`` pairs, backfilled by DEFAULT_ARGS — but with explicit
registries instead of reflection (reference resolves models/optimizers/
losses/transforms via getattr, run.py:127-157).
"""

from __future__ import annotations

import ast
from pathlib import Path
from typing import Any

import yaml

# Reference defaults (utils.py:21-40), minus torch-specific leftovers.
DEFAULT_ARGS: dict[str, Any] = {
    "outputpath": "experiments",
    "loss": "BCELoss",
    "batch_size": 32,
    "warmup_iters": 1000,
    "mixup": None,
    "num_workers": 2,
    "spectransforms": {},
    "wavtransforms": {},
    "early_stop": 10,
    "epochs": 100,
    "n_saved": 4,
    "optimizer": "Adam",
    "optimizer_args": {"lr": 0.001},
    "epoch_length": None,
    "use_scheduler": True,
    "num_classes": 527,
    "seed": 42,
}


def parse_override(value: str):
    """Parse a CLI override string into a Python value (ints, floats,
    bools, None, lists/dicts via literal_eval; else the raw string)."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        lowered = value.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none"):
            return None
        return value


def validate_frontend_precision(config: dict) -> str:
    """Resolve + validate the `frontend_precision` key ('exact' default,
    'fast' = the measured training-frontier kernels, PERF_NOTES round 4).

    Shared by the weak and SED training loops so a typo fails BEFORE any
    side effects (output dir, data loaders, model build) with one
    consistent message."""
    fe_prec = str(config.get("frontend_precision", "exact"))
    if fe_prec not in ("exact", "fast"):
        raise ValueError(
            f"frontend_precision must be 'exact' or 'fast', got {fe_prec!r}")
    return fe_prec


def parse_config_or_kwargs(config_file, default_args: dict | None = None, **kwargs):
    """YAML <- CLI kwargs <- defaults merge (reference utils.py:209-222)."""
    with open(config_file) as f:
        yaml_config = yaml.safe_load(f) or {}
    if not isinstance(yaml_config, dict):
        # a scalar/list top level would die in dict() with a message that
        # names neither the file nor the problem
        raise ValueError(
            f"config {config_file} must be a YAML mapping of option keys, "
            f"got {type(yaml_config).__name__}"
        )
    arguments = dict(yaml_config, **kwargs)
    for key, value in (default_args or DEFAULT_ARGS).items():
        arguments.setdefault(key, value)
    arguments.setdefault("config_stem", Path(config_file).stem)
    return arguments
