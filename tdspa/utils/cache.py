"""Persistent XLA compilation cache for the CLIs (ROADMAP round-2 #9).

First-run compiles dominate short CLI jobs (the scan-chunked decoder or a
batch-64 train step can take tens of minutes to compile through a remote-
tunnel TPU attachment); a persistent on-disk cache makes every later run —
and every other CLI sharing a program — start in seconds.

The reference has no counterpart (torch eager has no compile step); this is
the XLA-world replacement for "warm starts".
"""

from __future__ import annotations

import os

from absl import logging


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    Precedence: explicit ``path`` arg > ``JAX_COMPILATION_CACHE_DIR`` env
    (already honored by JAX itself — left alone) > ``~/.cache/tdspa/jax``.
    Set ``TDSPA_NO_COMPILE_CACHE=1`` to disable. Returns the directory in
    effect, or None when disabled.
    """
    if os.environ.get("TDSPA_NO_COMPILE_CACHE") == "1":
        return None
    env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None and env_dir:
        return env_dir  # JAX reads the env var itself at first backend use
    import jax

    cache_dir = path or os.path.join(
        os.path.expanduser("~"), ".cache", "tdspa", "jax"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful compile time; the default
        # (1 s) threshold already excludes trivial programs.
        logging.info("persistent compilation cache: %s", cache_dir)
        return cache_dir
    except (OSError, AttributeError) as e:  # unwritable home, old jax
        logging.warning("compilation cache disabled: %s", e)
        return None
