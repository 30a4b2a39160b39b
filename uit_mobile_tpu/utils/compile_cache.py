"""Persistent XLA compilation cache.

First compilation of the 1.5M-param forward takes 20-40 s on a remote TPU;
a persistent on-disk cache makes every later process (CLI invocations,
service restarts, evaluation sweeps) reuse the compiled executable. The
CLIs call `enable_compilation_cache()` at startup; opt out with
UIT_MOBILE_TPU_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile times)
or point UIT_MOBILE_TPU_COMPILE_CACHE at a shared directory.
"""

from __future__ import annotations

import os
from pathlib import Path

def _default_dir() -> Path:
    # read the env var at CALL time, not import time — setting it after
    # `import uit_mobile_tpu` must still take effect
    return Path(
        os.environ.get(
            "UIT_MOBILE_TPU_COMPILE_CACHE",
            Path.home() / ".cache" / "uit_mobile_tpu" / "xla_cache",
        )
    )


def enable_compilation_cache(path: str | os.PathLike | None = None) -> bool:
    """Point JAX's persistent compilation cache at `path` (default
    ~/.cache/uit_mobile_tpu/xla_cache). Call before the first jit
    dispatch; safe to call repeatedly. Returns True when enabled."""
    if os.environ.get("UIT_MOBILE_TPU_NO_COMPILE_CACHE"):
        return False
    import jax

    target = Path(path) if path else _default_dir()
    try:
        target.mkdir(parents=True, exist_ok=True)
        # JAX binds the cache object on first use; re-pointing the dir
        # afterwards needs an explicit reset or writes keep going to the
        # previously configured directory
        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current and current != str(target):
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc,
            )

            _cc.reset_cache()
        jax.config.update("jax_compilation_cache_dir", str(target))
        # cache anything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without the knobs
        return False
    return True
