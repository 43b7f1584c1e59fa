"""Pallas TPU kernel: fused transformer BLOCK (self-attention, no mask).

The decode roofline closure (docs/BENCHMARKS.md "Decode MFU") showed the
remaining non-matmul time is the residual stream's inter-matmul HBM
traffic: ~3.0 GB per readout layer of LayerNorm / residual-add / GELU
reads+writes over [512, 129, 1280] activations that XLA's loop fusions
already make in near-minimal passes — the only structural eliminator is
keeping the whole block's activations VMEM-resident. This kernel runs ONE
ParallelTransformerBlock layer (the exact architecture of
tdspa/core/attention.py for the self-attention-only, unmasked case — the
decode's ``track_readout_attn`` and ``decompress_attn`` stacks):

    ln1   = LayerNorm(x) * g1                      (bias-free, f32 stats)
    q/k   = RMSNorm_head(ln1 @ Wq), RMSNorm_head(ln1 @ Wk)
    v     = ln1 @ Wv
    att   = softmax(q k^T / sqrt(Dh)) v
    y     = x + att @ Wo + bo                      (parallel-block residual)
    out   = y + GELU(LayerNorm(y) * g2 @ W1 + b1) @ W2 + b2

per batch item, entirely in VMEM: the only HBM traffic is x in, out out,
and the block's ~9 MB of bf16 weights staged ONCE (constant block index —
the pipeline re-uses the buffer across grid steps). Matmuls run on the MXU
in bf16 with f32 accumulation; softmax/normalization statistics are f32.

Scope: forward-only (inference), self-attention, no masks — exactly the
decode hot path (reference track_autoencoder_3d.py:285 calls the readout
stack with no mask). Training and masked/cross paths stay on XLA.

Sharding: wrapped in ``custom_partitioning`` batch-only rules like the
attention kernels (tdspa/kernels/attention.py) so the mesh decode path
keeps the kernel on per-device query shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-item f32-equivalent VMEM element budget for the whole-block kernel
# (activations + logits + MLP hidden per item; weights are counted
# separately by the dispatcher).
_ITEM_ELEM_BUDGET = 6 * 1024 * 1024


def _layernorm(x, scale, eps=1e-6):
    """Bias-free LayerNorm, f32 stats; x [S, C], scale [1, C] (2D only —
    Mosaic rejects 1D vectors)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale


def _rmsnorm(x, scale, eps=1e-6):
    """RMSNorm over the last axis, f32 stats; x [S, D], scale [1, D]."""
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * scale


def _block_kernel(
    x_ref, g1_ref, wq_ref, sq_ref, wk_ref, sk_ref, wv_ref, wo_ref, bo_ref,
    g2_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, heads, scale,
):
    """One batch tile: x [TB, S, C] -> out [TB, S, C].

    Head-major weight layout (wq/wk/wv [H, C, Dh]; wo [H, Dh, C]) with a
    STATIC per-head loop of 2D matmuls: Mosaic cannot shape-cast the lane
    dimension ([S, H*Dh] -> [S, H, Dh] fails infer-vector-layout on the
    real chip), so the kernel never splits or merges lanes.
    """
    tile = x_ref.shape[0]

    def mm(a, b):  # [m, k] @ [k, n] on the MXU, f32 accumulation
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def item(i, _):
        x = x_ref[i].astype(jnp.float32)  # [S, C]
        ln1 = _layernorm(x, g1_ref[...].astype(jnp.float32)).astype(
            jnp.bfloat16
        )
        sq = sq_ref[...].astype(jnp.float32)  # [1, Dh]
        sk = sk_ref[...].astype(jnp.float32)

        att_out = None
        for h in range(heads):  # static unroll; 2D tiles only
            q = _rmsnorm(mm(ln1, wq_ref[h]), sq).astype(jnp.bfloat16)
            k = _rmsnorm(mm(ln1, wk_ref[h]), sk).astype(jnp.bfloat16)
            v = mm(ln1, wv_ref[h]).astype(jnp.bfloat16)  # [S, Dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [S, S]
            logits_max = jnp.max(logits, axis=-1, keepdims=True)
            unnorm = jnp.exp(logits - logits_max)
            probs = (
                unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
            ).astype(jnp.bfloat16)
            att = mm(probs, v).astype(jnp.bfloat16)  # [S, Dh]
            contrib = mm(att, wo_ref[h])  # [S, C] f32
            att_out = contrib if att_out is None else att_out + contrib

        y = x + att_out + bo_ref[...].astype(jnp.float32)  # [S, C] f32

        ln2 = _layernorm(y, g2_ref[...].astype(jnp.float32)).astype(
            jnp.bfloat16
        )
        hid = mm(ln2, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
        hid = jax.nn.gelu(hid, approximate=True).astype(jnp.bfloat16)
        mlp = mm(hid, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
        out_ref[i] = (y + mlp).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile, item, 0)


def _flatten_params(params, dtype=jnp.bfloat16):
    """(operands tuple) from a ParallelTransformerBlock param subtree.

    Projections are staged HEAD-MAJOR ([H, C, Dh] / [H, Dh, C]) so the
    kernel's per-head loop indexes the leading dim instead of shape-casting
    the lane dimension; 1D vectors become [1, n] rows (Mosaic constraints).
    """
    att = params["self_att"]

    def row(v):
        return jnp.asarray(v, dtype).reshape(1, -1)

    return (
        row(params["norm_q"]["scale"]),
        # dense_query kernel [C, H, Dh] -> [H, C, Dh]
        jnp.transpose(
            jnp.asarray(att["dense_query"]["kernel"], dtype), (1, 0, 2)
        ),
        row(att["norm_query"]["scale"]),
        jnp.transpose(
            jnp.asarray(att["dense_key"]["kernel"], dtype), (1, 0, 2)
        ),
        row(att["norm_key"]["scale"]),
        jnp.transpose(
            jnp.asarray(att["dense_value"]["kernel"], dtype), (1, 0, 2)
        ),
        # dense_out kernel [H, Dh, C] — already head-major
        jnp.asarray(att["dense_out"]["kernel"], dtype),
        row(att["dense_out"]["bias"]),
        row(params["norm_attn"]["scale"]),
        jnp.asarray(params["MLP_in"]["kernel"], dtype),
        row(params["MLP_in"]["bias"]),
        jnp.asarray(params["MLP_out"]["kernel"], dtype),
        row(params["MLP_out"]["bias"]),
    )


def fused_block_fits(batch, s, c, heads, depth, mlp) -> bool:
    """Whole-block VMEM feasibility for these shapes."""
    per_item = (
        4 * s * c  # x, ln, y, out working set (f32-equivalent)
        + 3 * s * heads * depth
        + 2 * heads * s * s  # logits + probs
        + 2 * s * mlp
    )
    weights = c * heads * depth * 3 + heads * depth * c + 2 * c * mlp
    return per_item <= _ITEM_ELEM_BUDGET and weights <= 16 * 1024 * 1024


def _block_forward(x, operands, heads, interpret=False,
                   out_dtype=jnp.float32):
    """Dispatch on local (possibly per-device) shapes. x [N, S, C]."""
    n, s, c = x.shape
    depth = operands[1].shape[2]  # wq [H, C, Dh]
    scale = 1.0 / (depth ** 0.5)
    x = x.astype(jnp.bfloat16)

    tile = 1
    while tile < 8 and n % (tile * 2) == 0:
        tile *= 2

    kernel = functools.partial(_block_kernel, heads=heads, scale=scale)
    in_specs = [
        pl.BlockSpec((tile, s, c), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # Weights/scales: constant block index — staged once, buffer re-used
    # across grid steps. (nd bound at definition time: late-binding lambda
    # in a loop would capture the last operand's rank.)
    for op in operands:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda b, nd=op.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, s, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, *operands)


# --- SPMD wrapping (same batch-only rules as kernels/attention.py) ---------


def _batch_only(mesh, batch_axes, info):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(
        mesh, PartitionSpec(batch_axes, *([None] * (len(info.shape) - 1)))
    )


def _batch_axes(mesh, x_info):
    """x's leading-axis mesh axes, or None when unsharded/indivisible
    (same logic as kernels/attention.py::_attn_batch_axes)."""
    spec = getattr(x_info.sharding, "spec", None)
    if not spec or len(spec) == 0 or spec[0] is None:
        return None
    axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    return axes if x_info.shape[0] % size == 0 else None


# x, g1, wq, sq, wk, sk, wv, wo, bo, g2, w1, b1, w2, b2 -> out.
# 'a' = the broadcast row axis (size 1) of vector operands; projections are
# head-major 3D (h c d / h d c).
_BLOCK_RULE = (
    "b s c, a c, h c d, a d, h c d, a d, h c d, h d c, a c, a c, c m, a m,"
    " m c, a c -> b s c"
)


def _spmd_block(heads: int, interpret: bool, out_dtype):
    """Build the custom_partitioning-wrapped block entry: x batch-sharded,
    weights replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning

    def base(x, *operands):
        return _block_forward(x, operands, heads, interpret=interpret,
                              out_dtype=out_dtype)

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _batch_only(
            mesh, _batch_axes(mesh, arg_shapes[0]), result_shape
        )

    def partition(mesh, arg_shapes, result_shape):
        axes = _batch_axes(mesh, arg_shapes[0])
        arg_shardings = (_batch_only(mesh, axes, arg_shapes[0]),) + tuple(
            _batch_only(mesh, None, a) for a in arg_shapes[1:]
        )
        result_sharding = _batch_only(mesh, axes, result_shape)

        def lower(*args):
            return base(*args)

        return mesh, lower, result_sharding, arg_shardings

    fn = custom_partitioning(base)
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=_BLOCK_RULE,
    )
    return fn


def fused_transformer_block(
    x,  # float['*B S C']
    params,  # ParallelTransformerBlock param subtree (dict)
    heads: int,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    """One unmasked self-attention ParallelTransformerBlock layer, fused.

    Numerics: bf16 matmuls with f32 accumulation, f32 normalization
    statistics and residual carries — at least as accurate as the XLA
    bf16-compute path it replaces (tested vs the f32 XLA oracle to bf16
    tolerance, tests/unit/test_block_kernel.py).
    """
    lead = x.shape[:-2]
    s, c = x.shape[-2:]
    operands = _flatten_params(params)
    xf = x.reshape((-1, s, c))
    out = _spmd_block(heads, interpret, out_dtype)(xf, *operands)
    return out.reshape(lead + (s, c))
