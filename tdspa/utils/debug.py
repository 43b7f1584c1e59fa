"""Debug toggles (SURVEY §5 sanitizers row).

The reference has no numeric sanitizers; the JAX-native equivalent is the
``jax_debug_nans`` config flag — under it every jitted computation is
re-run op-by-op when a NaN appears in an output, and the producing op
raises with a full traceback. Exposed as ``--debug_nans`` on every CLI
that dispatches device work (train / infer / evaluate).
"""

from __future__ import annotations


def enable_debug_nans(enabled: bool = True) -> None:
    """Toggle ``jax_debug_nans`` (NaN-producing ops raise instead of
    propagating). Costs a re-execution only when a NaN actually occurs;
    leave off in production serving."""
    import jax

    jax.config.update("jax_debug_nans", bool(enabled))
