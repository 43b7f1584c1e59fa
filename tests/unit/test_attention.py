"""Unit tests: attention core vs flax oracle, QK-norm wiring, mask handling."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdspa.core.attention import (
    QKNormAttention,
    TransformerStack,
    masked_dot_product_attention,
)


def test_attention_core_matches_flax_oracle():
    # The reference uses flax's nn.dot_product_attention with a float mask —
    # that IS the numerical oracle for our core.
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    B, Q, K, H, D = 2, 5, 7, 4, 8
    q = jax.random.normal(ks[0], (B, Q, H, D))
    k = jax.random.normal(ks[1], (B, K, H, D))
    v = jax.random.normal(ks[2], (B, K, H, D))
    mask = (jax.random.uniform(ks[3], (B, 1, Q, K)) > 0.4).astype(jnp.float32)

    ours = masked_dot_product_attention(q, k, v, mask=mask)
    theirs = nn.dot_product_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)

    ours_nomask = masked_dot_product_attention(q, k, v)
    theirs_nomask = nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(ours_nomask), np.asarray(theirs_nomask), atol=1e-5
    )


def test_fully_masked_row_is_finite_mean_of_values():
    B, Q, K, H, D = 1, 2, 3, 1, 4
    q = jnp.ones((B, Q, H, D))
    k = jnp.ones((B, K, H, D))
    v = jnp.arange(B * K * H * D, dtype=jnp.float32).reshape(B, K, H, D)
    mask = jnp.zeros((B, 1, Q, K))  # nothing attendable
    out = masked_dot_product_attention(q, k, v, mask=mask)
    assert bool(jnp.isfinite(out).all())
    # Uniform weights -> mean over keys (flax fully-masked semantics).
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(v.mean(axis=1)[0]), atol=1e-5
    )


def test_qknorm_attention_param_tree_and_shapes():
    mod = QKNormAttention(num_heads=4, qk_size=32)
    q = jnp.ones((2, 5, 16))
    kv = jnp.ones((2, 7, 24))
    variables = mod.init(jax.random.PRNGKey(0), q, kv)
    out = mod.apply(variables, q, kv)
    assert out.shape == (2, 5, 16)  # output projected back to q width
    p = variables["params"]
    assert sorted(p.keys()) == [
        "dense_key", "dense_out", "dense_query", "dense_value",
        "norm_key", "norm_query",
    ]
    assert p["dense_query"]["kernel"].shape == (16, 4, 8)
    assert p["dense_key"]["kernel"].shape == (24, 4, 8)
    assert p["dense_out"]["kernel"].shape == (4, 8, 16)
    assert "bias" in p["dense_out"] and "bias" not in p["dense_query"]
    # RMSNorm over the head dim.
    assert p["norm_query"]["scale"].shape == (8,)


def test_qknorm_manual_recompute():
    """Recompute QKNormAttention by hand from its params."""
    mod = QKNormAttention(num_heads=2, qk_size=8)
    key = jax.random.PRNGKey(1)
    q_in = jax.random.normal(key, (1, 3, 6))
    kv_in = jax.random.normal(key, (1, 4, 6))
    variables = mod.init(key, q_in, kv_in)
    out = mod.apply(variables, q_in, kv_in)

    p = variables["params"]
    def rms(x, scale):
        return x * jax.lax.rsqrt(jnp.mean(x**2, -1, keepdims=True) + 1e-6) * scale

    q = jnp.einsum("bqd,dhc->bqhc", q_in, p["dense_query"]["kernel"])
    k = jnp.einsum("bnd,dhc->bnhc", kv_in, p["dense_key"]["kernel"])
    q = rms(q, p["norm_query"]["scale"])
    k = rms(k, p["norm_key"]["scale"])
    v = jnp.einsum("bnd,dhc->bnhc", kv_in, p["dense_value"]["kernel"])
    logits = jnp.einsum("bqhc,bnhc->bhqn", q / jnp.sqrt(4.0), k)
    probs = jax.nn.softmax(logits, -1)
    attn = jnp.einsum("bhqn,bnhc->bqhc", probs, v)
    expected = (
        jnp.einsum("bqhc,hcd->bqd", attn, p["dense_out"]["kernel"])
        + p["dense_out"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_stack_layer_names_and_mask_rank_insertion():
    stack = TransformerStack(qkv_size=8, num_heads=2, mlp_size=16, num_layers=3)
    x = jnp.ones((2, 4, 5, 12))  # rank 4
    kv = jnp.ones((2, 4, 6, 10))
    qk_mask = jnp.ones((2, 4, 5, 6))  # rank == operand rank -> head axis inserted
    qq_mask = jnp.ones((2, 4, 5, 5))
    variables = stack.init(jax.random.PRNGKey(0), x, kv, qk_mask, qq_mask)
    out = stack.apply(variables, x, kv, qk_mask, qq_mask)
    assert out.shape == x.shape
    assert sorted(variables["params"].keys()) == [
        "layer_0", "layer_1", "layer_2", "norm_encoder",
    ]
    blk = variables["params"]["layer_0"]
    assert sorted(blk.keys()) == [
        "MLP_in", "MLP_out", "cross_att", "norm_attn", "norm_q", "self_att",
    ]


def test_stack_self_attention_only():
    stack = TransformerStack(qkv_size=8, num_heads=2, mlp_size=16, num_layers=1)
    x = jnp.ones((2, 5, 12))
    variables = stack.init(jax.random.PRNGKey(0), x)
    out = stack.apply(variables, x)
    assert out.shape == x.shape
    assert "cross_att" not in variables["params"]["layer_0"]


def test_bf16_compute_close_to_f32():
    stack32 = TransformerStack(qkv_size=16, num_heads=2, mlp_size=32, num_layers=2)
    stack16 = TransformerStack(
        qkv_size=16, num_heads=2, mlp_size=32, num_layers=2, dtype=jnp.bfloat16
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    variables = stack32.init(jax.random.PRNGKey(1), x)
    o32 = stack32.apply(variables, x)
    o16 = stack16.apply(variables, x)
    assert o16.dtype == jnp.float32  # residual stream stays f32
    np.testing.assert_allclose(np.asarray(o32), np.asarray(o16), atol=0.15)


def test_bf16_residual_close_to_f32():
    # Inference-only knob: bf16 residual stream (halves the decoder's
    # elementwise/HBM traffic — docs/BENCHMARKS.md "Decode roofline").
    stack32 = TransformerStack(qkv_size=16, num_heads=2, mlp_size=32, num_layers=2)
    stack16 = TransformerStack(
        qkv_size=16, num_heads=2, mlp_size=32, num_layers=2,
        dtype=jnp.bfloat16, residual_dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    variables = stack32.init(jax.random.PRNGKey(1), x)
    o32 = stack32.apply(variables, x)
    o16 = stack16.apply(variables, x)
    assert o16.dtype == jnp.bfloat16
    # Same param tree: the knob must not change checkpoint structure.
    assert jax.tree.structure(stack16.init(jax.random.PRNGKey(1), x)) == (
        jax.tree.structure(variables)
    )
    np.testing.assert_allclose(
        np.asarray(o32), np.asarray(o16, dtype=np.float32), atol=0.2
    )
