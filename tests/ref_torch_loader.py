"""Load the reference PyTorch models from /root/reference with their
unavailable deps stubbed (offline differential-parity harness).

The published zenodo checkpoints were trained with exactly the code at
``/root/reference/models/uit.py`` / ``mobilenetv2.py``. torch 2.13 (CPU) is
installed here, but three of the reference's imports are not: ``timm`` (only
``to_2tuple``/``DropPath``/``trunc_normal_`` are used, uit.py:8-9),
``torchaudio`` (only for the ``front_end`` DSP, which we bypass), and
``loguru`` (logging only). Stubbing those three and importing the reference
module lets us run the reference encoder itself, so agreement between it and
our JAX implementation — through the checkpoint converter, in both
directions — is the strongest parity evidence available without network
access to the actual checkpoint dumps.

The audio frontend is bypassed (``front_end`` is replaced with
``nn.Identity`` and mel tensors are fed directly); mel numerics are
parity-tested separately against committed torchaudio goldens
(tests/test_frontend.py).

The stubs are inert outside these tests: none of timm/torchaudio/loguru is
installed or imported anywhere else in this repo.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "models" / "uit.py").is_file()


def _install_stubs():
    import torch
    import torch.nn as nn

    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru

    if "timm" not in sys.modules:

        def to_2tuple(x):
            return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

        class DropPath(nn.Module):
            # Only instantiated when drop_path > 0 (reference uit.py:232);
            # all shipped factories use drop_path_rate=0, and these tests
            # run in eval mode, where timm's DropPath is identity anyway.
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if not self.training or self.drop_prob == 0.0:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x * mask / keep

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_helpers = types.ModuleType("timm.models.layers.helpers")
        timm_helpers.to_2tuple = to_2tuple
        timm_layers.helpers = timm_helpers
        timm_layers.DropPath = DropPath
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
        sys.modules["timm.models.layers.helpers"] = timm_helpers

    if "torchaudio" not in sys.modules:

        class _FrontendStub(nn.Module):
            """Constructible with the reference's kwargs; must never run —
            the tests replace the whole front_end with nn.Identity."""

            def __init__(self, **kwargs):
                super().__init__()

            def forward(self, x):  # pragma: no cover
                raise AssertionError(
                    "torchaudio stub executed: front_end was not bypassed"
                )

        torchaudio = types.ModuleType("torchaudio")
        transforms = types.ModuleType("torchaudio.transforms")
        transforms.MelSpectrogram = type("MelSpectrogram", (_FrontendStub,), {})
        transforms.AmplitudeToDB = type("AmplitudeToDB", (_FrontendStub,), {})
        torchaudio.transforms = transforms
        sys.modules["torchaudio"] = torchaudio
        sys.modules["torchaudio.transforms"] = transforms


_CACHE: dict[str, object] = {}


def load_reference_module(name: str):
    """Import /root/reference/models/<name>.py under a private module name."""
    if name in _CACHE:
        return _CACHE[name]
    _install_stubs()
    path = REFERENCE / "models" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"_reference_models_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _CACHE[name] = mod
    return mod
