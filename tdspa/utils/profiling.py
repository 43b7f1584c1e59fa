"""Tracing / profiling hooks (aux subsystem; the reference has none).

* ``stage_timer`` — wall-clock a pipeline stage with ``block_until_ready``
  so async dispatch doesn't hide device time; accumulates into a dict.
* ``profile_trace`` — context manager around ``jax.profiler`` producing a
  Perfetto/XProf trace directory.
* ``debug_nans`` — toggle jax nan-debugging for a scope.
* ``log_compile_time`` — measure first-call (compile) vs steady-state time
  of a jitted function.
"""

from __future__ import annotations

import contextlib
import time

from absl import logging
import jax


@contextlib.contextmanager
def stage_timer(name: str, sink: dict | None = None):
    """Time a stage; blocks on any jax.Array assigned to ``sink[name+'_out']``."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    logging.info("[stage] %s: %.4fs", name, dt)


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """jax.profiler trace scope -> Perfetto-compatible dump in log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans (race-free alternative to sanitizers on TPU)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def log_compile_time(fn, *args, iters: int = 3, **kwargs):
    """Run fn once (compile) + ``iters`` steady-state; returns (compile_s,
    steady_s, last_output)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    steady_s = (time.perf_counter() - t0) / iters
    logging.info("compile=%.3fs steady=%.4fs", compile_s, steady_s)
    return compile_s, steady_s, out
