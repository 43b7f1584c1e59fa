"""Dynamic int8 quantization for the transformer projection matmuls.

VERDICT-r2 #7 / ROADMAP round-2 #2: the 512q/2048s decode forward is
~12 TFLOP of dense projections running at ~80% of the v5e bf16 roofline —
further wins must CUT effective FLOP cost, not reschedule it. v5e's MXU
executes int8 x int8 -> int32 at 2x the bf16 rate (~394 TOPS), so routing
the projection/MLP matmuls (>= 90% of model FLOPs; attention score/value
contractions at 129-151 tokens are the small remainder) through int8 halves
their cost.

Scheme — dynamic ("on-the-fly") symmetric quantization, no calibration:
* activations: per-row (token) scale = max|x| / 127, rounded to int8;
* weights: per-column (output feature) scale = max|W| / 127. Weights are
  stored in f32 exactly as the bf16 path stores them (identical checkpoint
  layout); quantization is recomputed per call, an O(d_in*d_out)
  elementwise pass that is noise next to the O(tokens*d_in*d_out) matmul.
* y = (xq @ Wq) * (row_scale x col_scale) + b, accumulated in int32,
  scaled in f32.

The per-row/per-column factorization keeps the dequantization exact for
the outer-product scale structure, so the only error is int8 rounding of
mantissas — measured < 2% relative on the full decode forward
(tests/unit/test_quant.py), with zero change to parameter trees.

This is an inference-path knob (``quantize='int8'`` on TransformerStack /
the models); training stays bf16/f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dynamic_int8(x, axis):
    """Symmetric per-slice int8 quantization along every axis EXCEPT
    ``axis`` (the contraction axis keeps full granularity elsewhere).

    Returns (q int8, scale f32) with q * scale ~= x; scale has size-1
    dims over ``axis``.
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul(x, w):
    """x [... m k] @ w [k n] with dynamic int8 inputs, int32 MXU
    accumulation, exact outer-product dequantization.

    On TPU, dispatches to the fused Pallas kernel
    (tdspa/kernels/quant_matmul.py): activation quantization happens in
    VMEM instead of costing extra HBM round trips — the overhead that made
    this XLA path 27% slower than bf16 (docs/BENCHMARKS.md round 3).
    """
    from tdspa.kernels import quant_matmul as _kq

    if (
        jax.default_backend() in ("tpu", "axon") or _kq.INTERPRET_DEFAULT
    ) and _kq.quant_matmul_fits(x.shape[-1], w.shape[-1]):
        return _kq.quant_matmul(x, w)
    xq, xs = _dynamic_int8(x, axis=-1)         # row scales [... m 1]
    wq, ws = _dynamic_int8(w, axis=0)          # col scales [1 n]
    acc = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * ws


import flax.linen as nn  # noqa: E402  (module tail: flax-facing wrappers)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with the int8 dynamic-quantized matmul.

    Declares IDENTICAL parameters (same names, shapes, initializers), so a
    checkpoint trained/saved on the bf16 path loads unchanged — quantization
    is a pure inference-time compute rewrite.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        y = int8_matmul(x, kernel)
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return y


class QuantDenseGeneral(nn.Module):
    """Drop-in ``nn.DenseGeneral`` (axis=-1 -> tuple features, or
    axis=(-2, -1) -> int features) with the int8 matmul."""

    features: tuple | int
    axis: tuple | int = -1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        feats = (
            (self.features,) if isinstance(self.features, int)
            else tuple(self.features)
        )
        ax = (self.axis,) if isinstance(self.axis, int) else tuple(self.axis)
        contract = tuple(x.shape[a] for a in ax)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            contract + feats, jnp.float32,
        )
        import numpy as np

        k = int(np.prod(contract))
        n = int(np.prod(feats))
        y = int8_matmul(
            x.reshape(x.shape[: x.ndim - len(ax)] + (k,)),
            kernel.reshape(k, n),
        )
        y = y.reshape(y.shape[:-1] + feats)
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, feats, jnp.float32
            )
        return y
