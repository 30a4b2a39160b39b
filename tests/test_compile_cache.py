"""Persistent compilation cache helper."""

import os

import jax
import jax.numpy as jnp

from uit_mobile_tpu.utils import enable_compilation_cache


def test_enable_compilation_cache_populates_dir(tmp_path, monkeypatch):
    # an earlier test (e.g. a CLI main) may have initialized the cache at
    # the default path; JAX binds the cache object once, so re-pointing
    # the dir needs an explicit reset
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()
    target = tmp_path / "xla"
    assert enable_compilation_cache(target) is True
    # force even trivial programs into the cache for the assertion
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        jax.jit(lambda x: (x @ x).sum() + 3.5)(jnp.ones((64, 64))).block_until_ready()
        assert target.exists() and len(os.listdir(target)) > 0
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        cc.reset_cache()


def test_repointing_dir_resets_cache(tmp_path):
    """Calling the helper with a new dir after the cache was bound must
    redirect writes (the helper resets the singleton itself)."""
    def lower_thresholds():
        # the helper sets a 1 s min compile time; the toy programs here
        # compile instantly, so force everything into the cache
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    try:
        assert enable_compilation_cache(tmp_path / "a") is True
        lower_thresholds()
        jax.jit(lambda x: x * 2.0 + 1.25)(jnp.ones((32, 32))).block_until_ready()
        assert enable_compilation_cache(tmp_path / "b") is True
        lower_thresholds()
        jax.jit(lambda x: x * 3.0 - 0.75)(jnp.ones((32, 32))).block_until_ready()
        assert (tmp_path / "b").exists() and len(os.listdir(tmp_path / "b")) > 0
    finally:
        from jax.experimental.compilation_cache import compilation_cache as cc

        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        cc.reset_cache()


def test_opt_out_env(tmp_path, monkeypatch):
    monkeypatch.setenv("UIT_MOBILE_TPU_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache(tmp_path / "nope") is False
    assert not (tmp_path / "nope").exists()
