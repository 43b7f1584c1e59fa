"""Persistent XLA compilation cache for the CLIs (ROADMAP round-2 #9).

First-run compiles dominate short CLI jobs (the scan-chunked decoder or a
batch-64 train step can take tens of minutes to compile through a remote-
tunnel TPU attachment); a persistent on-disk cache makes every later run —
and every other CLI sharing a program — start in seconds.

The reference has no counterpart (torch eager has no compile step); this is
the XLA-world replacement for "warm starts".
"""

from __future__ import annotations

import hashlib
import os

from absl import logging


def host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU serializes AOT-compiled executables into the compilation
    cache keyed WITHOUT the host machine features; loading an entry
    compiled on a CPU with a different feature set (e.g. avx512/amx
    present vs absent) SIGSEGVs/SIGILLs at deserialization — observed
    in this environment, where successive rounds land on different
    hosts sharing /tmp. Namespacing the cache directory by this
    fingerprint makes foreign entries invisible instead of fatal.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.machine() + platform.processor()
    return hashlib.sha256(flags.encode()).hexdigest()[:10]


def fingerprinted_cache_dir(base: str) -> str:
    """``base`` namespaced by the host CPU fingerprint (see above)."""
    return f"{base.rstrip(os.sep)}-{host_fingerprint()}"


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a persistent directory.

    Precedence: explicit ``path`` arg > ``JAX_COMPILATION_CACHE_DIR`` env
    > ``~/.cache/tdspa/jax``. Every directory (including the env var's) is
    namespaced with the host CPU fingerprint — entries AOT-compiled on a
    different machine crash at load, they don't miss (see
    ``host_fingerprint``). Set ``TDSPA_NO_COMPILE_CACHE=1`` to disable.
    Returns the directory in effect, or None when disabled.
    """
    if os.environ.get("TDSPA_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    cache_dir = fingerprinted_cache_dir(
        path
        or env_dir
        or os.path.join(os.path.expanduser("~"), ".cache", "tdspa", "jax")
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
