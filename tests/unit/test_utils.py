"""Utility-tier tests (compilation cache wiring)."""

import os

from tdspa.utils.cache import enable_persistent_compilation_cache


def test_cache_env_var_wins(monkeypatch, tmp_path):
    monkeypatch.delenv("TDSPA_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envdir"))
    assert enable_persistent_compilation_cache() == str(tmp_path / "envdir")


def test_cache_explicit_path(monkeypatch, tmp_path):
    monkeypatch.delenv("TDSPA_NO_COMPILE_CACHE", raising=False)
    import jax

    prev = jax.config.jax_compilation_cache_dir
    target = str(tmp_path / "cache")
    try:
        assert enable_persistent_compilation_cache(target) == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_opt_out(monkeypatch):
    monkeypatch.setenv("TDSPA_NO_COMPILE_CACHE", "1")
    assert enable_persistent_compilation_cache() is None
