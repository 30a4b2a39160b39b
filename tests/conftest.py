"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a host-simulated mesh (the idiomatic JAX
fake backend); the real TPU chip is exercised by bench.py, not by unit tests.
Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize re-forces JAX_PLATFORMS=axon at interpreter start;
# override programmatically before any backend is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
