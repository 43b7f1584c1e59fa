"""Pallas TPU kernel: fused masked multi-head attention (VMEM-resident).

The model's attention workloads are many *short* sequences (151 frame tokens
per track, 129 tokens per decode query, 128 latents) batched over a large
set axis (N tracks / Q queries). XLA materializes the [batch, H, S, S]
logits and softmax in HBM between the two matmuls — at N=2048, T+1=151 that
is ~1.5 GB of f32 traffic per layer each way. This kernel keeps one batch
tile's q/k/v, logits, softmax, and output entirely in VMEM: per grid step it
runs QK^T on the MXU, key-masking + a numerically-stable softmax on the VPU,
and PV on the MXU, writing only the [tile, S, H, D] output to HBM.

Scope: forward-only (inference / the no-grad eval path), self- or
cross-attention with an optional KEY mask [B, 1, K-broadcastable] — the only
mask form the models use (all query rows identical; see tdspa/core/masks.py).
Fully-masked rows degrade to the uniform average of values, matching the
XLA path and the reference's flax semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale):
    """One batch tile: q [TB,S,H,D], k/v [TB,K,H,D], mask [TB,1,K] -> out.

    Mosaic's matmul supports one batch dimension, so the tile loops over its
    items with ``fori_loop`` and each item's attention batches over heads.
    """
    tile = q_ref.shape[0]

    def item(i, _):
        # Head-major layout: Mosaic's batched matmul requires the batch
        # (head) dim at position 0.
        q = jnp.transpose(q_ref[i].astype(jnp.bfloat16), (1, 0, 2))  # [H,S,D]
        k = jnp.transpose(k_ref[i].astype(jnp.bfloat16), (1, 0, 2))  # [H,K,D]
        v = jnp.transpose(v_ref[i].astype(jnp.bfloat16), (1, 0, 2))

        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, S, K]
        logits = logits * scale

        if mask_ref is not None:
            mask = mask_ref[i]  # [1, K]
            big_neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(
                (mask != 0)[jnp.newaxis, :, :], logits, big_neg
            )

        logits_max = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits - logits_max)
        denom = jnp.sum(unnorm, axis=-1, keepdims=True)
        probs = (unnorm / denom).astype(jnp.bfloat16)  # [H, S, K]

        out = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, S, D]
        out_ref[i] = jnp.transpose(out, (1, 0, 2)).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile, item, 0)


def _mha_flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, out_ref, m_ref, d_ref, acc_ref, *, scale
):
    """KV-blocked online-softmax attention (one batch item per grid row).

    grid = (batch, kv_blocks); the TPU grid executes sequentially with the
    last dimension fastest, so the running max / denominator / weighted-value
    accumulators live in VMEM scratch across a row's kv steps and the
    normalized output is written once at the final block. This serves shapes
    whose whole KV set exceeds the VMEM budget — e.g. the 3DSPA encoder's
    128-latent x N-track cross-attention at N=2048 (SURVEY §2.6's named
    native-tier target).
    """
    kv_i = pl.program_id(1)
    num_kv = pl.num_programs(1)
    big_neg = jnp.finfo(jnp.float32).min

    @pl.when(kv_i == 0)
    def _():
        # finfo.min (not -inf): fully-masked rows then keep alpha = exp(0)=1
        # and accumulate uniform weights -> the mean of values, matching the
        # unblocked kernel and the reference's flax semantics.
        m_ref[:] = jnp.full(m_ref.shape, big_neg, jnp.float32)
        d_ref[:] = jnp.zeros(d_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    # Head-major: Mosaic's batched matmul needs the batch (head) dim first.
    q = jnp.transpose(q_ref[0].astype(jnp.bfloat16), (1, 0, 2))  # [H,S,D]
    k = jnp.transpose(k_ref[0].astype(jnp.bfloat16), (1, 0, 2))  # [H,KB,D]
    v = jnp.transpose(v_ref[0].astype(jnp.bfloat16), (1, 0, 2))

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [H, S, KB]
    if mask_ref is not None:
        mask = mask_ref[0]  # [1, KB]; 1 = attend, 0 = user-masked, -1 = pad
        logits = jnp.where((mask > 0)[jnp.newaxis, :, :], logits, big_neg)

    m_prev = m_ref[:]  # [H, S]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    alpha = jnp.exp(m_prev - m_new)  # [H, S]
    p = jnp.exp(logits - m_new[..., jnp.newaxis])  # [H, S, KB]
    if mask_ref is not None:
        # Padded keys are excluded even from the fully-masked-row uniform
        # fallback (where every real key's p becomes exp(0) = 1); user-masked
        # keys stay in it, matching the unblocked kernel / flax semantics.
        p = p * (mask >= 0)[jnp.newaxis, :, :]
    d_ref[:] = d_ref[:] * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, S, D]
    acc_ref[:] = acc_ref[:] * alpha[..., jnp.newaxis] + pv
    m_ref[:] = m_new

    @pl.when(kv_i == num_kv - 1)
    def _():
        out = acc_ref[:] / d_ref[:][..., jnp.newaxis]
        out_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(out_ref.dtype)


def _mha_flash_perhead_kernel(
    q_ref, k_ref, v_ref, out_ref, m_ref, d_ref, acc_ref, *, scale, kv_len
):
    """Maskless KV-blocked online softmax, one HEAD per grid row.

    grid = (batch, heads, kv_blocks). Serves long-sequence shapes whose
    all-heads flash step overflows VMEM — e.g. DINOv2's 1297-token frames
    (12 heads x 1297 x 1297 logits). Layout keeps every reduction on
    sublanes: logits are computed transposed [KB, S], the running max /
    denominator are [1, S], and the accumulator is [D, S] (scaled by
    [1, S] broadcasts); the single [D, S] -> [S, D] transpose happens once
    at the last block.
    """
    kv_i = pl.program_id(2)
    num_kv = pl.num_programs(2)
    big_neg = jnp.finfo(jnp.float32).min

    @pl.when(kv_i == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, big_neg, jnp.float32)
        d_ref[:] = jnp.zeros(d_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0, 0].astype(jnp.bfloat16)  # [S, D]
    k = k_ref[0, 0].astype(jnp.bfloat16)  # [KB, D]
    v = v_ref[0, 0].astype(jnp.bfloat16)

    logits_t = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [KB, S]
    kb = logits_t.shape[0]
    # Tail-block padding: key rows past the true kv_len drop out via -inf
    # logits (computed from the static kv_len — no mask operand needed).
    if (pl.num_programs(2) * kb) != kv_len:
        row = jax.lax.broadcasted_iota(jnp.int32, logits_t.shape, 0)
        valid = (row + pl.program_id(2) * kb) < kv_len
        logits_t = jnp.where(valid, logits_t, big_neg)

    m_prev = m_ref[:]  # [1, S]
    m_new = jnp.maximum(m_prev, jnp.max(logits_t, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # [1, S]
    p = jnp.exp(logits_t - m_new)  # [KB, S]
    d_ref[:] = d_ref[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(
        v, p.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, S]
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = m_new

    @pl.when(kv_i == num_kv - 1)
    def _():
        out = acc_ref[:] / d_ref[:]  # [D, S]
        out_ref[0, 0] = jnp.transpose(out, (1, 0)).astype(out_ref.dtype)


def _flash_perhead(q, k, v, kb: int = 512, interpret: bool = False,
                   out_dtype=jnp.float32):
    """Per-head KV-blocked dispatch (maskless). q [B,S,H,D] -> [B,S,H,D]."""
    batch, s, heads, depth = q.shape
    kv_len = k.shape[1]
    scale = 1.0 / (depth ** 0.5)
    pad = (-kv_len) % kb
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    num_kv = (kv_len + pad) // kb

    # Head-major [B, H, S, D]: Mosaic rejects blocking the head axis at
    # position -2 (last two block dims must be full or (8, 128)-divisible),
    # so the head moves into the leading (freely blockable) dims.
    q = jnp.transpose(q.astype(jnp.bfloat16), (0, 2, 1, 3))
    k = jnp.transpose(k.astype(jnp.bfloat16), (0, 2, 1, 3))
    v = jnp.transpose(v.astype(jnp.bfloat16), (0, 2, 1, 3))
    out = pl.pallas_call(
        functools.partial(
            _mha_flash_perhead_kernel, scale=scale, kv_len=kv_len
        ),
        grid=(batch, heads, num_kv),
        in_specs=[
            pl.BlockSpec((1, 1, s, depth), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kb, depth), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kb, depth), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s, depth), lambda b, h, i: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, heads, s, depth), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((1, s), jnp.float32),
            pltpu.VMEM((1, s), jnp.float32),
            pltpu.VMEM((depth, s), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return jnp.transpose(out, (0, 2, 1, 3))  # back to [B, S, H, D]


def _pick_kv_block(kv_len: int, s: int, heads: int, depth: int) -> int:
    """Largest KV block (multiple of 128, <= 512) whose step fits VMEM."""
    for kb in (512, 384, 256, 128):
        # logits + p (f32) + double-buffered bf16 k/v blocks + q/out/acc.
        elems = (
            2 * heads * s * kb
            + 2 * kb * heads * depth
            + 3 * s * heads * depth
        )
        if elems <= VMEM_ELEM_BUDGET:
            return kb
    return 128


def _flash_attention(q, k, v, key_mask, interpret: bool = False,
                     out_dtype=jnp.float32):
    """KV-blocked dispatch: pads KV to a block multiple and runs the online-
    softmax kernel. q [B,S,H,D], k/v [B,K,H,D], key_mask [B,K] or None."""
    batch, s, heads, depth = q.shape
    kv_len = k.shape[1]
    scale = 1.0 / (depth ** 0.5)

    if key_mask is None and _flash_step_elems(s, heads, depth) > VMEM_ELEM_BUDGET:
        # All-heads-resident step overflows VMEM (long sequences like the
        # 1297-token ViT frames): per-head grid variant.
        return _flash_perhead(q, k, v, interpret=interpret,
                              out_dtype=out_dtype)

    kb = _pick_kv_block(kv_len, s, heads, depth)
    pad = (-kv_len) % kb
    if pad and key_mask is None:
        key_mask = jnp.ones((batch, kv_len), jnp.float32)
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # Pad marker -1 (vs user-masked 0): see _mha_flash_kernel.
        key_mask = jnp.pad(
            key_mask.astype(jnp.float32), ((0, 0), (0, pad)),
            constant_values=-1.0,
        )
    padded_kv = kv_len + pad
    num_kv = padded_kv // kb

    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)

    kernel = functools.partial(_mha_flash_kernel, scale=scale)
    operands = [q, k, v]
    in_specs = [
        pl.BlockSpec((1, s, heads, depth), lambda b, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb, heads, depth), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb, heads, depth), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if key_mask is not None:
        operands.append(key_mask.astype(jnp.float32)[:, jnp.newaxis, :])
        in_specs.append(
            pl.BlockSpec((1, 1, kb), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
        )
        wrapped = kernel
    else:
        def wrapped(q_ref, k_ref, v_ref, out_ref, m_ref, d_ref, acc_ref):
            kernel(q_ref, k_ref, v_ref, None, out_ref, m_ref, d_ref, acc_ref)

    return pl.pallas_call(
        wrapped,
        grid=(batch, num_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, s, heads, depth), lambda b, i: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, s, heads, depth), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((heads, s), jnp.float32),
            pltpu.VMEM((heads, s), jnp.float32),
            pltpu.VMEM((heads, s, depth), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _pick_tile(batch: int, budget_elems: int, per_item: int) -> int:
    tile = max(1, budget_elems // max(per_item, 1))
    while batch % tile:
        tile -= 1
    return tile


def _fused_forward(q, k, v, key_mask=None, interpret: bool = False,
                   out_dtype=jnp.float32):
    """Kernel dispatch on (possibly per-device local) shapes — see
    ``fused_masked_attention`` for the public contract."""
    batch, s, heads, depth = q.shape
    kv_len = k.shape[1]
    scale = 1.0 / (depth ** 0.5)

    per_item = _per_item_elems(s, kv_len, heads, depth)
    if per_item > VMEM_ELEM_BUDGET:
        # Whole-KV doesn't fit one item's VMEM tile: KV-blocked online
        # softmax (the 128x2048 tracks_to_latents cross-attention path).
        return _flash_attention(q, k, v, key_mask, interpret=interpret,
                                out_dtype=out_dtype)

    # Stage operands as bf16 (the kernel computes in bf16 anyway): halves
    # VMEM block size and HBM traffic.
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    tile = min(_pick_tile(batch, VMEM_ELEM_BUDGET, per_item), 8)
    while batch % tile:
        tile -= 1

    kernel = functools.partial(_mha_kernel, scale=scale)
    operands = [q, k, v]
    in_specs = [
        pl.BlockSpec((tile, s, heads, depth), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, kv_len, heads, depth), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, kv_len, heads, depth), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if key_mask is not None:
        # 3D [B, 1, K] so the (1, K) trailing block dims match the array
        # exactly (Mosaic tiling constraint) for any batch tile size.
        operands.append(key_mask.astype(jnp.float32)[:, jnp.newaxis, :])
        in_specs.append(
            pl.BlockSpec((tile, 1, kv_len), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        wrapped = kernel
    else:
        def wrapped(q_ref, k_ref, v_ref, out_ref):
            kernel(q_ref, k_ref, v_ref, None, out_ref)

    return pl.pallas_call(
        wrapped,
        grid=(batch // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, s, heads, depth), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, s, heads, depth), out_dtype),
        interpret=interpret,
    )(*operands)


# --- SPMD wrapping -----------------------------------------------------------
#
# Pallas calls carry no partitioning rules, so under jit-over-a-Mesh the
# GSPMD/Shardy partitioner would replicate every operand around them — the
# mesh decode path would silently lose the kernels (round-2 VERDICT weak #2).
# ``custom_partitioning`` declares the kernel batch-parallel over its leading
# axis: each device runs the (unchanged) kernel on its batch shard, and the
# in-kernel shape dispatch sees LOCAL shapes, so tile/flash selection adapts
# per shard. Non-batch shardings (e.g. a KV set sharded over 'seq' feeding
# latent cross-attention) are unified to batch-only here, which makes the
# partitioner insert the same gather XLA's softmax path would need anyway.


def _batch_only_sharding(mesh, batch_axes, info):
    from jax.sharding import NamedSharding, PartitionSpec

    ndim = len(info.shape)
    return NamedSharding(
        mesh, PartitionSpec(batch_axes, *([None] * (ndim - 1)))
    )


def _attn_batch_axes(mesh, q_info):
    """q's leading-axis mesh axes, or None when unsharded/indivisible."""
    spec = getattr(q_info.sharding, "spec", None)
    if not spec or len(spec) == 0 or spec[0] is None:
        return None
    batch_axes = spec[0]
    names = batch_axes if isinstance(batch_axes, tuple) else (batch_axes,)
    nshards = 1
    for n in names:
        nshards *= mesh.shape[n]
    if q_info.shape[0] % nshards:
        return None  # uneven split: stay replicated rather than mis-tile
    return batch_axes


@functools.lru_cache(maxsize=None)
def _spmd_fused(has_mask: bool, interpret: bool, out_dtype=jnp.float32):
    """Build (and cache) the custom_partitioning-wrapped kernel entry."""
    from jax.experimental.custom_partitioning import custom_partitioning

    if has_mask:
        def base(q, k, v, key_mask):
            return _fused_forward(q, k, v, key_mask, interpret=interpret,
                                  out_dtype=out_dtype)
        rule = "b s h d, b k h d, b k h d, b k -> b s h d"
    else:
        def base(q, k, v):
            return _fused_forward(q, k, v, None, interpret=interpret,
                                  out_dtype=out_dtype)
        rule = "b s h d, b k h d, b k h d -> b s h d"

    def infer_sharding(mesh, arg_shapes, result_shape):
        return _batch_only_sharding(
            mesh, _attn_batch_axes(mesh, arg_shapes[0]), result_shape
        )

    def partition(mesh, arg_shapes, result_shape):
        batch_axes = _attn_batch_axes(mesh, arg_shapes[0])
        arg_shardings = tuple(
            _batch_only_sharding(mesh, batch_axes, a) for a in arg_shapes
        )
        result_sharding = _batch_only_sharding(mesh, batch_axes, result_shape)

        def lower(*args):
            return base(*args)

        return mesh, lower, result_sharding, arg_shardings

    fn = custom_partitioning(base)
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=rule,
    )
    return fn


# Force interpret-mode kernels everywhere (CPU tests of TPU-only paths,
# e.g. the fused-model mesh tail on the 8-virtual-device mesh). Read at
# TRACE time — set it before the first call of the program under test.
INTERPRET_DEFAULT = False


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _fused_entry(q, k, v, key_mask=None, interpret: bool = False,
                 out_dtype=jnp.float32):
    if key_mask is None:
        return _spmd_fused(False, interpret, out_dtype)(q, k, v)
    return _spmd_fused(True, interpret, out_dtype)(q, k, v, key_mask)


def fused_masked_attention(q, k, v, key_mask=None, interpret: bool = False,
                           out_dtype=jnp.float32):
    """Fused attention: q [B,S,H,D], k/v [B,K,H,D], key_mask [B,K] -> [B,S,H,D].

    Equivalent to ``masked_dot_product_attention`` with a key-only mask
    (scaling by 1/sqrt(D) applied inside). bf16 matmuls, f32 softmax.
    SPMD-capable: under a mesh, the batch axis shards and each device runs
    the kernel on its local shard (see the custom_partitioning block above).
    ``out_dtype``: HBM dtype of the result — pass bf16 when the consumer
    casts to bf16 anyway (e.g. a bf16 output projection); halves the
    kernel's output write + the consumer's read.
    """
    return _fused_entry(
        q, k, v, key_mask, interpret=interpret or INTERPRET_DEFAULT,
        out_dtype=out_dtype,
    )


VMEM_ELEM_BUDGET = 2_500_000  # f32 elements per tile (~10 MB of ~16 MB VMEM)


def _per_item_elems(s, kv_len, heads, depth) -> int:
    """Per-batch-item VMEM estimate (f32-element units): logits + exp temp
    (f32), double-buffered bf16 operand blocks, f32 output block. The SAME
    formula gates dispatch (``fused_attention_fits``) and sizes tiles, so a
    gate-passing shape always compiles at tile >= 1."""
    return (
        2 * heads * s * kv_len
        + (s + 2 * kv_len) * heads * depth
        + 2 * s * heads * depth
    )


def _flash_step_elems(s, heads, depth, kb: int = 128) -> int:
    return 2 * heads * s * kb + 2 * kb * heads * depth + 3 * s * heads * depth


def _perhead_step_elems(s, depth, kb: int = 512) -> int:
    return 2 * kb * s + 2 * kb * depth + 3 * s * depth


def fused_attention_fits(batch, s, kv_len, heads, depth,
                         maskless: bool = False) -> bool:
    """True when the shape is serviceable by a fused kernel: the whole KV
    fits one item's VMEM tile, a 128-wide KV block does (blocked online
    softmax), or — maskless only — a per-head KV block does (long-sequence
    ViT shapes)."""
    del batch
    if _per_item_elems(s, kv_len, heads, depth) <= VMEM_ELEM_BUDGET:
        return True
    if _flash_step_elems(s, heads, depth) <= VMEM_ELEM_BUDGET:
        return True
    return maskless and _perhead_step_elems(s, depth) <= VMEM_ELEM_BUDGET


def _xla_reference(q, k, v, key_mask):
    """The XLA fallback/backward implementation (same math)."""
    depth = q.shape[-1]
    qs = q.astype(jnp.bfloat16) / jnp.sqrt(depth).astype(jnp.bfloat16)
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", qs, k.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if key_mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(
            (key_mask != 0)[..., jnp.newaxis, jnp.newaxis, :], logits, big_neg
        )
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "...hqk,...khd->...qhd", probs.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q, k, v, key_mask):
    """Differentiable fused attention: Pallas forward, XLA-recompute backward.

    The backward pass re-runs the XLA reference under ``jax.vjp`` (a
    remat-style trade: one extra forward instead of storing the probs)."""
    return fused_masked_attention(q, k, v, key_mask)


def _fused_fwd(q, k, v, key_mask):
    return fused_masked_attention(q, k, v, key_mask), (q, k, v, key_mask)


def _fused_bwd(residuals, g):
    q, k, v, key_mask = residuals
    if key_mask is None:
        _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(_xla_reference, q, k, v, key_mask)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, jnp.zeros_like(key_mask)


fused_attention.defvjp(_fused_fwd, _fused_bwd)
