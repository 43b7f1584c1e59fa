"""Fused transformer-block kernel (tdspa/kernels/block.py) vs the XLA path.

Tolerances are bf16-compute-level: the kernel runs bf16 matmuls with f32
accumulation and f32 normalization statistics — the same numerics class as
the XLA bf16 path it replaces (which itself sits ~4e-3 relative from the
f32 oracle at these widths; CLAUDE.md MXU note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdspa.core.attention import ParallelTransformerBlock, TransformerStack
from tdspa.kernels.block import fused_block_fits, fused_transformer_block

S, C, HEADS, QKV, MLP = 33, 256, 4, 128, 192


@pytest.fixture(scope="module")
def block_and_params():
    block = ParallelTransformerBlock(
        mlp_size=MLP, num_heads=HEADS, qkv_size=QKV
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (6, S, C))
    variables = block.init(jax.random.PRNGKey(1), x, None)
    return block, variables, x


def test_matches_xla_block(block_and_params):
    block, variables, x = block_and_params
    ref = block.apply(variables, x, None)  # f32 XLA oracle
    got = fused_transformer_block(
        x, variables["params"], HEADS, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=2e-2
    )
    # Relative error in bf16-compute territory.
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1e-3
    )
    assert np.median(rel) < 5e-3, np.median(rel)


def test_leading_batch_dims_flatten(block_and_params):
    block, variables, x = block_and_params
    x2 = x.reshape(2, 3, S, C)
    ref = fused_transformer_block(
        x, variables["params"], HEADS, interpret=True
    )
    got = fused_transformer_block(
        x2, variables["params"], HEADS, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got).reshape(6, S, C), np.asarray(ref)
    )


def test_stack_dispatch_uses_kernel(monkeypatch):
    """fused_block=True routes unmasked self-attention through the kernel
    (INTERPRET_DEFAULT on CPU) and matches the plain stack to bf16
    tolerance; masked/cross calls fall back to XLA exactly."""
    from tdspa.kernels import attention as ka

    monkeypatch.setattr(ka, "INTERPRET_DEFAULT", True)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, S, C))
    kv = jax.random.normal(jax.random.PRNGKey(3), (4, 7, 64))
    plain = TransformerStack(
        qkv_size=QKV, num_heads=HEADS, mlp_size=MLP, num_layers=2
    )
    fused = TransformerStack(
        qkv_size=QKV, num_heads=HEADS, mlp_size=MLP, num_layers=2,
        fused_block=True,
    )
    variables = plain.init(jax.random.PRNGKey(4), x)
    ref = plain.apply(variables, x)
    got = fused.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=5e-2
    )
    assert not np.array_equal(np.asarray(got), np.asarray(ref))  # kernel ran

    # Cross-attention present -> identical to the XLA path (no kernel).
    variables_x = plain.init(jax.random.PRNGKey(5), x, inputs_kv=kv)
    ref_x = plain.apply(variables_x, x, inputs_kv=kv)
    got_x = fused.apply(variables_x, x, inputs_kv=kv)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref_x))


def test_fits_predicate():
    # Decode operating point fits; absurd widths don't.
    assert fused_block_fits(512, 129, 1280, 8, 96, 1536)
    assert not fused_block_fits(512, 4096, 8192, 8, 1024, 32768)
