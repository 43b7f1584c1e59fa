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
jax.config.update("jax_compilation_cache_dir", "/tmp/tdspa_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
