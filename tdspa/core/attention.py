"""QK-norm parallel-path transformer stack.

This is the single attention stack used by both track autoencoders. The
architecture contract comes from the reference (/root/reference/attention.py):

* ``QKNormAttention`` — multi-head dot-product attention with bias-free Q/K/V
  projections, RMSNorm applied to the *projected* query and key heads
  (attention.py:154-167), and a biased output projection over the flattened
  head axes (attention.py:178-183).
* ``ParallelTransformerBlock`` — one shared pre-LayerNorm; self-attention and
  (optionally) cross-attention are computed from the same normalized queries
  and both added to the raw residual in parallel (attention.py:76-100); the
  MLP follows its own LayerNorm (attention.py:103-108). Cross-attention K/V
  come from the *unnormalized* ``inputs_kv``.
* ``TransformerStack`` — ``num_layers`` blocks named ``layer_{i}`` with a
  final bias-free LayerNorm ``norm_encoder`` (attention.py:37-51), and the
  rank-match head-axis auto-insertion for masks (attention.py:32-35).

Parameter names/shapes match the reference exactly so released ``.npz``
checkpoints load unchanged. The *implementation* is TPU-first: computation
dtype is configurable (bfloat16 matmuls on the MXU with float32 softmax and
accumulation), attention is a single batched einsum pipeline XLA fuses into
MXU ops, and masks are applied with a large-negative fill that preserves the
reference's fully-masked-row semantics (uniform weights -> mean of values).
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn
import jax
import jax.numpy as jnp


def _fused_attention_applicable(q, k, mask) -> bool:
    """Fused Pallas path: TPU backend, key-only mask, VMEM-sized tiles."""
    from tdspa.kernels import attention as _ka

    if (
        jax.default_backend() not in ("tpu", "axon")
        and not _ka.INTERPRET_DEFAULT  # CPU tests force interpret kernels
    ):
        return False
    if mask is not None and (mask.shape[-2] != 1 or mask.shape[-3] != 1):
        return False  # not a pure key (query-broadcast) mask
    if q.shape[:-3] != k.shape[:-3]:
        return False
    from tdspa.kernels.attention import fused_attention_fits

    batch = 1
    for d in q.shape[:-3]:
        batch *= d
    return fused_attention_fits(
        batch, q.shape[-3], k.shape[-3], q.shape[-2], q.shape[-1]
    )


def _fused_attention(q, k, v, mask, out_dtype=jnp.float32):
    """Flatten leading batch dims and dispatch the Pallas fused kernel."""
    from tdspa.kernels.attention import fused_attention, fused_masked_attention

    lead = q.shape[:-3]
    s, h, d = q.shape[-3:]
    kv = k.shape[-3]
    qf = q.reshape((-1, s, h, d))
    kf = k.reshape((-1, kv, h, d))
    vf = v.reshape((-1, kv, h, d))
    key_mask = None
    if mask is not None:
        key_mask = jnp.broadcast_to(
            mask[..., 0, 0, :], lead + (kv,)
        ).reshape((-1, kv)).astype(jnp.float32)
    if out_dtype == jnp.float32:
        # Differentiable wrapper (XLA-recompute backward) — training path.
        out = fused_attention(qf, kf, vf, key_mask)
    else:
        # bf16-residual inference: the kernel writes bf16 straight to HBM
        # (halves its output write + the out-projection's read).
        out = fused_masked_attention(qf, kf, vf, key_mask, out_dtype=out_dtype)
    return out.reshape(lead + (s, h, d))


def masked_dot_product_attention(
    query,  # float['*B Q H D']
    key,  # float['*B K H D']
    value,  # float['*B K H D']
    mask=None,  # Optional['*B #H #Q #K'] (any dtype; nonzero == attend)
    compute_dtype: Any = jnp.float32,
):
    """Multi-head attention core with f32 softmax and configurable matmul dtype.

    Heads ride the MXU as one batched matmul; the softmax always runs in
    float32. A fully-masked query row degrades to uniform weights (the mean of
    the values), matching the reference's flax semantics.
    """
    depth = query.shape[-1]
    q = query.astype(compute_dtype) / jnp.sqrt(depth).astype(compute_dtype)
    k = key.astype(compute_dtype)
    v = value.astype(compute_dtype)

    # (*B Q H D) x (*B K H D) -> (*B H Q K), accumulated in f32.
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask.astype(bool), logits, big_neg)
    probs = nn.softmax(logits, axis=-1)

    out = jnp.einsum(
        "...hqk,...khd->...qhd",
        probs.astype(compute_dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out


class QKNormAttention(nn.Module):
    """Multi-head dot-product attention with RMSNorm on projected Q/K heads.

    Attributes:
      num_heads: number of attention heads.
      qk_size: total query/key projection width (split across heads).
      v_size: total value width; defaults to ``qk_size``.
      dtype: computation dtype for the matmuls (params stay float32).
    """

    num_heads: int
    qk_size: int
    v_size: Optional[int] = None
    dtype: Any = jnp.float32
    use_fused: bool = False
    # int8 dynamic quantization of the four projection matmuls (2x MXU
    # rate on v5e; see tdspa/core/quant.py). Same parameter tree.
    quantize: bool = False
    # Dtype of the returned (residual-stream) activations. f32 matches the
    # reference numerics; bf16 halves the residual/elementwise HBM traffic
    # the decode profile showed dominating the non-matmul time
    # (docs/BENCHMARKS.md "Decode profile") — inference-only knob.
    residual_dtype: Any = jnp.float32

    def _dense_general(self, features, axis=-1, use_bias=False, name=None):
        if self.quantize:
            from tdspa.core.quant import QuantDenseGeneral

            return QuantDenseGeneral(
                features=features, axis=axis, use_bias=use_bias, name=name
            )
        return nn.DenseGeneral(
            features=features, axis=axis, use_bias=use_bias,
            dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        inputs_q,  # float['*B Q d1']
        inputs_kv,  # float['*B K d2']
        mask=None,  # Optional['*B #H #Q #K']
    ):
        v_size = self.qk_size if self.v_size is None else self.v_size
        if self.qk_size % self.num_heads:
            raise ValueError(f"{self.num_heads=} must divide {self.qk_size=}.")
        if v_size % self.num_heads:
            raise ValueError(f"{v_size=} must divide {self.num_heads=}.")

        head_qk = self.qk_size // self.num_heads
        head_v = v_size // self.num_heads

        query = self._dense_general(
            (self.num_heads, head_qk), name="dense_query"
        )(inputs_q)
        key = self._dense_general(
            (self.num_heads, head_qk), name="dense_key"
        )(inputs_kv)

        # QK-norm: RMS-normalize each projected head. Statistics are always
        # f32 (flax upcasts internally); the OUTPUT dtype follows the compute
        # dtype — both consumers (the Pallas kernel and the einsum core) cast
        # to the compute dtype immediately, so a bf16 store here is
        # numerics-free and halves this intermediate's HBM traffic.
        query = nn.RMSNorm(dtype=self.dtype, name="norm_query")(query)
        key = nn.RMSNorm(dtype=self.dtype, name="norm_key")(key)

        value = self._dense_general(
            (self.num_heads, head_v), name="dense_value"
        )(inputs_kv)

        if self.use_fused and _fused_attention_applicable(query, key, mask):
            x = _fused_attention(
                query, key, value, mask, out_dtype=self.residual_dtype
            )
        else:
            x = masked_dot_product_attention(
                query, key, value, mask=mask, compute_dtype=self.dtype
            )

        out = self._dense_general(
            inputs_q.shape[-1], axis=(-2, -1), use_bias=True,
            name="dense_out",
        )(x)
        return out.astype(self.residual_dtype)


def _fused_block_applicable(module, queries, inputs_kv, qq_mask, qk_mask):
    """Whole-block Pallas path: inference-only, self-attention, no masks."""
    if (
        module.is_initializing()  # init must create params via the XLA path
        or inputs_kv is not None
        or qq_mask is not None
        or qk_mask is not None
        or module.quantize
    ):
        return False
    from tdspa.kernels import attention as _ka

    if (
        jax.default_backend() not in ("tpu", "axon")
        and not _ka.INTERPRET_DEFAULT
    ):
        return False
    from tdspa.kernels.block import fused_block_fits

    batch = 1
    for d in queries.shape[:-2]:
        batch *= d
    s, c = queries.shape[-2:]
    return batch > 0 and fused_block_fits(
        batch, s, c, module.num_heads, module.qkv_size // module.num_heads,
        module.mlp_size,
    )


class ParallelTransformerBlock(nn.Module):
    """Pre-LN block with parallel self- + cross-attention into one residual."""

    mlp_size: int
    num_heads: int
    qkv_size: int
    dtype: Any = jnp.float32
    use_fused: bool = False
    quantize: bool = False
    residual_dtype: Any = jnp.float32  # see QKNormAttention.residual_dtype
    # Whole-block Pallas kernel for the unmasked self-attention case (the
    # decode hot path): keeps the layer's residual stream VMEM-resident,
    # eliminating the ~3 GB/layer of LayerNorm/residual/GELU HBM traffic
    # the decode profile showed as the non-matmul floor. MEASURED
    # NEGATIVE at decode shapes (3.3x slower than the XLA path — Mosaic's
    # no-lane-reshape rule forces per-head short matmuls that waste the
    # MXU; docs/BENCHMARKS.md "Fused transformer-block kernel"); kept as
    # a recorded-negative toggle. Inference-only; falls back to the XLA
    # path for init/training/masked/cross/quantized calls.
    fused_block: bool = False

    def _dense(self, features, name):
        if self.quantize:
            from tdspa.core.quant import QuantDense

            return QuantDense(features=features, name=name)
        return nn.Dense(features, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(
        self,
        queries,  # float['*b n d']
        inputs_kv,  # Optional[float['*b N D']]
        qq_mask=None,
        qk_mask=None,
    ):
        if self.fused_block and _fused_block_applicable(
            self, queries, inputs_kv, qq_mask, qk_mask
        ):
            from tdspa.kernels import attention as _ka
            from tdspa.kernels.block import fused_transformer_block

            # Apply-time only (init runs the XLA path below and creates the
            # standard param tree); the kernel consumes this block's own
            # subtree directly.
            return fused_transformer_block(
                queries,
                self.variables["params"],
                self.num_heads,
                interpret=_ka.INTERPRET_DEFAULT,
                out_dtype=self.residual_dtype,
            )
        width = queries.shape[-1]
        # Norm statistics are always f32 (flax promotes internally); the
        # OUTPUT dtype follows the residual stream.
        normed_queries = nn.LayerNorm(
            use_bias=False, use_scale=True, dtype=self.residual_dtype,
            name="norm_q",
        )(queries)
        attn_out = queries.astype(self.residual_dtype)

        attn_out += QKNormAttention(
            num_heads=self.num_heads,
            qk_size=self.qkv_size,
            dtype=self.dtype,
            use_fused=self.use_fused,
            quantize=self.quantize,
            residual_dtype=self.residual_dtype,
            name="self_att",
        )(inputs_q=normed_queries, inputs_kv=normed_queries, mask=qq_mask)

        if inputs_kv is not None:
            attn_out += QKNormAttention(
                num_heads=self.num_heads,
                qk_size=self.qkv_size,
                dtype=self.dtype,
                use_fused=self.use_fused,
                quantize=self.quantize,
                residual_dtype=self.residual_dtype,
                name="cross_att",
            )(inputs_q=normed_queries, inputs_kv=inputs_kv, mask=qk_mask)

        normed_attn_out = nn.LayerNorm(
            use_bias=False, use_scale=True, dtype=self.residual_dtype,
            name="norm_attn",
        )(attn_out)
        h = nn.gelu(
            self._dense(self.mlp_size, "MLP_in")(normed_attn_out)
        )
        mlp_out = self._dense(width, "MLP_out")(h)
        return attn_out + mlp_out.astype(self.residual_dtype)


class TransformerStack(nn.Module):
    """Stack of ``ParallelTransformerBlock`` layers + final LayerNorm.

    Mask convention: ``qq_mask`` gates self-attention, ``qk_mask`` gates
    cross-attention to ``inputs_kv``. If a mask's rank equals the rank of its
    operand, a broadcast head axis is inserted automatically
    (reference attention.py:32-35).
    """

    qkv_size: int
    num_heads: int
    mlp_size: int
    num_layers: int
    dtype: Any = jnp.float32
    use_fused: bool = False
    quantize: bool = False
    residual_dtype: Any = jnp.float32  # see QKNormAttention.residual_dtype
    fused_block: bool = False  # see ParallelTransformerBlock.fused_block

    @nn.compact
    def __call__(
        self,
        queries,  # float['... d1']
        inputs_kv=None,  # Optional[float['*b N D']]
        qk_mask=None,
        qq_mask=None,
    ):
        if (
            qk_mask is not None
            and inputs_kv is not None
            and qk_mask.ndim == inputs_kv.ndim
        ):
            qk_mask = qk_mask[..., jnp.newaxis, :, :]
        if qq_mask is not None and qq_mask.ndim == queries.ndim:
            qq_mask = qq_mask[..., jnp.newaxis, :, :]

        for i in range(self.num_layers):
            queries = ParallelTransformerBlock(
                qkv_size=self.qkv_size,
                num_heads=self.num_heads,
                mlp_size=self.mlp_size,
                dtype=self.dtype,
                use_fused=self.use_fused,
                quantize=self.quantize,
                residual_dtype=self.residual_dtype,
                fused_block=self.fused_block,
                name=f"layer_{i}",
            )(queries, inputs_kv=inputs_kv, qq_mask=qq_mask, qk_mask=qk_mask)

        return nn.LayerNorm(
            use_bias=False, use_scale=True, dtype=self.residual_dtype,
            name="norm_encoder",
        )(queries)
