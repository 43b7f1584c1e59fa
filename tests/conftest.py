"""Test configuration: force an 8-virtual-device CPU mesh.

The environment may register a TPU tunnel platform at interpreter start; unit
tests must not depend on (or pay the init latency of) real TPU hardware.
``jax_platforms`` is flipped to CPU before any backend initializes, and the
host platform is split into 8 virtual devices so sharding/mesh tests exercise
real multi-device partitioning on one host.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Namespaced by host CPU fingerprint: XLA:CPU AOT cache entries from a
# DIFFERENT host (rounds share /tmp across machines) segfault at load —
# see tdspa/utils/cache.py::host_fingerprint.
from tdspa.utils.cache import fingerprinted_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", fingerprinted_cache_dir("/tmp/tdspa_jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_executable_mappings():
    """Shed compiled-executable memory mappings between test modules.

    Every live XLA:CPU executable holds mmap'd code pages; across the full
    suite the process accumulates tens of thousands of mappings and, on
    hosts with the default ``vm.max_map_count`` (65530), a failed mmap
    inside executable load SEGFAULTS the suite (observed deterministically
    at ~[85%], maps >53k and climbing ~100/s). Clearing JAX's caches drops
    executables the finished module no longer references. Gated on an
    actual-mappings threshold so healthy runs keep their warm jit caches.
    """
    yield
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:
        return
    if n_maps > 30_000:
        jax.clear_caches()
