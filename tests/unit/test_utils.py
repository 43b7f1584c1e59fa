"""Utility-tier tests (compilation cache wiring)."""

import os

from tdspa.utils.cache import (
    enable_persistent_compilation_cache,
    fingerprinted_cache_dir,
    host_fingerprint,
)


def test_host_fingerprint_stable_and_short():
    fp = host_fingerprint()
    assert fp == host_fingerprint()  # deterministic on one host
    assert len(fp) == 10


def test_cache_env_var_wins(monkeypatch, tmp_path):
    monkeypatch.delenv("TDSPA_NO_COMPILE_CACHE", raising=False)
    import jax

    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envdir"))
    try:
        # Env dir is honored but namespaced by the host CPU fingerprint
        # (foreign-host XLA:CPU AOT entries segfault at load).
        assert enable_persistent_compilation_cache() == fingerprinted_cache_dir(
            str(tmp_path / "envdir")
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_explicit_path(monkeypatch, tmp_path):
    monkeypatch.delenv("TDSPA_NO_COMPILE_CACHE", raising=False)
    import jax

    prev = jax.config.jax_compilation_cache_dir
    target = str(tmp_path / "cache")
    expect = fingerprinted_cache_dir(target)
    try:
        assert enable_persistent_compilation_cache(target) == expect
        assert os.path.isdir(expect)
        assert jax.config.jax_compilation_cache_dir == expect
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_opt_out(monkeypatch):
    monkeypatch.setenv("TDSPA_NO_COMPILE_CACHE", "1")
    assert enable_persistent_compilation_cache() is None


def test_debug_nans_toggle():
    """--debug_nans (SURVEY §5 sanitizers): under jax_debug_nans a
    NaN-producing jitted op raises instead of propagating."""
    import jax
    import jax.numpy as jnp
    import pytest

    from tdspa.utils.debug import enable_debug_nans

    f = jax.jit(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x - 2.0))
    try:
        enable_debug_nans(True)
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(f(jnp.asarray(1.0)))
    finally:
        enable_debug_nans(False)
    assert jnp.isnan(f(jnp.asarray(1.0)))
