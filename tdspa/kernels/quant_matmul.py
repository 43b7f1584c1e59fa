"""Pallas TPU kernel: fused dynamic-int8 matmul (activation quant in VMEM).

Why a kernel: plain-XLA dynamic int8 (tdspa/core/quant.py) measured 27%
SLOWER than bf16 on the decode forward because the per-call quantize /
dequantize elementwise passes cost extra HBM round trips over the
activations (84M elements each way at the 512q decode shapes) that XLA
cannot fuse into the dot (docs/BENCHMARKS.md round 3, "int8 dynamic
quantization"). This kernel removes exactly that overhead:

* weights are quantized OUTSIDE the kernel (per-output-column symmetric
  scales) — an O(K*N) pass over a few MB, negligible next to the
  O(M*K*N) matmul and done once per dispatch;
* activations are quantized INSIDE the kernel: each [bm, K] tile is read
  from HBM once in the CALLER's dtype (bf16 on the serving path; f32
  inputs are not down-cast, so both dispatch paths quantize from
  identical values), per-row amax/round/clip happen in VMEM, and the
  int8 tile feeds the MXU directly — zero extra HBM traffic;
* the s8 x s8 -> s32 MXU dot runs at 2x the bf16 rate on v5e;
* dequantization (exact for the per-row x per-column outer-product scale
  structure) and the bias add fuse into the output write.

Layout: the whole [K, N] weight stays VMEM-resident (constant block —
Mosaic fetches it once and keeps it across grid steps); the grid walks M
tiles. The decode stacks' largest weight is [1536, 1280] (3.9 MB bf16 as
s8 + f32 scales), comfortably inside the ~16 MB VMEM budget alongside a
[bm, K] activation tile and the [bm, N] f32 output block.

Accuracy: identical scale structure to the XLA path (per-row activation,
per-column weight), so the error bound is the same int8 mantissa rounding
(< 2% relative on the full decode forward, tests/unit/test_quant.py).

Scope: inference (forward-only). The reference has no quantization tier
at all; this is TPU-native serving machinery. SPMD-capable: the kernel
entry is ``custom_partitioning``-wrapped over x's leading (token) axis
with the int8 weight replicated, so the ``quantize`` knob composes with
the mesh decode path (tests/dist/test_sharding.py,
test_pipeline_mesh.py::test_mesh_tail_serving_config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Force interpret-mode kernels (CPU tests of the TPU dispatch path, e.g.
# the quantized mesh tail on the virtual-device mesh). Read at TRACE time.
INTERPRET_DEFAULT = False


def _quant_matmul_kernel(x_ref, wq_ref, ws_ref, out_ref):
    """One M tile: quantize rows in VMEM, s8 MXU dot, fused dequant.

    x_ref: [bm, K] (bf16/f32); wq_ref: [K, N] int8; ws_ref: [1, N] f32
    (per-column weight scales); out_ref: [bm, N] f32.
    """
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # [bm, 1]
    sx = jnp.maximum(amax, 1e-30) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [bm, N] s32
    out_ref[...] = acc.astype(jnp.float32) * sx * ws_ref[...]


def _pick_bm(m: int, k: int, n: int) -> int:
    """Largest M tile (multiple of 8, <= 1024) fitting the VMEM budget:
    x tile (in + f32 staged + s8) + resident wq/ws + f32 out block."""
    budget = 2_500_000  # f32-element units, ~10 MB of ~16 MB VMEM
    resident = (k * n) // 4 + n  # s8 weight + f32 scales
    # Input tile counted at f32 width (worst case — native-dtype staging).
    per_row = k + k + k // 4 + n  # f32 x + input + s8 + f32 out
    fitting = [
        bm for bm in (1024, 512, 256, 128, 64, 32, 16, 8)
        if resident + bm * per_row <= budget
    ]
    if not fitting:
        return 8
    # Minimize padded work (ceil(m/bm)*bm); largest bm breaks ties so
    # divisible shapes still get the widest tile.
    return min(fitting, key=lambda bm: (-(-m // bm) * bm, -bm))


def quant_matmul_fits(k: int, n: int) -> bool:
    """True when the [K, N] weight (s8) + scales fit the resident budget
    with at least a bm=8 activation tile."""
    return (k * n) // 4 + n + 8 * (9 * k // 4 + n) <= 2_500_000


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quant_matmul_pallas(x2d, wq, ws, interpret=False):
    m, k = x2d.shape
    n = wq.shape[1]
    bm = _pick_bm(m, k, n)
    pad = (-m) % bm
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    mp = m + pad
    out = pl.pallas_call(
        _quant_matmul_kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # Constant block: Mosaic keeps it resident across grid steps.
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        interpret=interpret,
        # Native-dtype staging: quantization sees the caller's exact values
        # on BOTH dispatch paths (an unconditional bf16 cast here would make
        # f32 inputs round differently from the XLA fallback below).
    )(x2d, wq, ws)
    return out[:m] if pad else out


# SPMD wrapping (same pattern as kernels/attention.py): declare the kernel
# row-parallel over x's leading axis with replicated weight/scales, so a
# mesh-sharded decode keeps the kernel on local shards instead of GSPMD
# replicating everything around the opaque pallas call.


def _row_sharding(mesh, row_axes, info):
    from jax.sharding import NamedSharding, PartitionSpec

    ndim = len(info.shape)
    return NamedSharding(
        mesh, PartitionSpec(row_axes, *([None] * (ndim - 1)))
    )


def _repl_sharding(mesh, info):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(*([None] * len(info.shape))))


def _row_axes(mesh, x_info):
    spec = getattr(x_info.sharding, "spec", None)
    if not spec or len(spec) == 0 or spec[0] is None:
        return None
    axes = spec[0]
    names = axes if isinstance(axes, tuple) else (axes,)
    nshards = 1
    for a in names:
        nshards *= mesh.shape[a]
    if x_info.shape[0] % nshards:
        return None
    return axes


@functools.lru_cache(maxsize=None)
def _spmd_quant_matmul(interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning

    def base(x2d, wq, ws):
        return _quant_matmul_pallas(x2d, wq, ws, interpret=interpret)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _row_sharding(
            mesh, _row_axes(mesh, arg_shapes[0]), result_shape
        )

    def partition(mesh, arg_shapes, result_shape):
        row_axes = _row_axes(mesh, arg_shapes[0])
        arg_shardings = (
            _row_sharding(mesh, row_axes, arg_shapes[0]),
            _repl_sharding(mesh, arg_shapes[1]),
            _repl_sharding(mesh, arg_shapes[2]),
        )
        result_sharding = _row_sharding(mesh, row_axes, result_shape)

        def lower(*args):
            return base(*args)

        return mesh, lower, result_sharding, arg_shardings

    fn = custom_partitioning(base)
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="m k, k n, o n -> m n",
    )
    return fn


def quant_matmul(x, w, interpret: bool = False):
    """x [... K] @ w [K, N] via fused dynamic-int8: returns [... N] f32.

    Semantics match tdspa.core.quant.int8_matmul (per-row activation /
    per-column weight symmetric scales, s32 accumulation, exact
    outer-product dequantization); only the schedule differs — activation
    quantization happens in VMEM with no extra HBM traffic. SPMD-capable:
    under a mesh, x's leading (token) axis shards and each device runs the
    kernel on its local rows with the int8 weight replicated.
    """
    k = x.shape[-1]
    n = w.shape[-1]
    if not quant_matmul_fits(k, n):
        # The [K, N] weight would not fit VMEM-resident; this would fail
        # only at REAL-CHIP compile time (interpret mode checks neither
        # block shapes nor the VMEM stack). Fall back to the XLA int8
        # path (same math, HBM-staged quantization).
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        xs = (jnp.maximum(amax, 1e-30) / 127.0).astype(jnp.float32)
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        amax_w = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        ws = (jnp.maximum(amax_w, 1e-30) / 127.0).astype(jnp.float32)
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * xs * ws
    # Per-column weight quantization in XLA (small, once per dispatch).
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    ws = (jnp.maximum(amax, 1e-30) / 127.0).astype(jnp.float32)
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    x2d = x.reshape(-1, k)
    out = _spmd_quant_matmul(interpret or INTERPRET_DEFAULT)(x2d, wq, ws)
    return out.reshape(x.shape[:-1] + (n,))
