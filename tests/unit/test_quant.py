"""int8 dynamic-quantization tier (tdspa/core/quant.py).

The quantized path must be a pure compute rewrite: identical parameter
trees (a bf16-path checkpoint loads unchanged) and outputs within int8
rounding distance of the full-precision forward.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdspa.core.quant import (
    QuantDense,
    QuantDenseGeneral,
    int8_matmul,
)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 128)), jnp.float32)
    ref = x @ w
    got = int8_matmul(x, w)
    rel = float(
        jnp.linalg.norm(got - ref) / (jnp.linalg.norm(ref) + 1e-9)
    )
    # Two int8 roundings at ~0.4% each; the error adds in quadrature.
    assert rel < 0.02, rel


def test_int8_matmul_scale_invariance():
    """Per-row/per-column scales absorb gross magnitude structure."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 48)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(48, 24)), jnp.float32)
    row_scale = jnp.asarray(
        10.0 ** rng.uniform(-3, 3, size=(32, 1)), jnp.float32
    )
    col_scale = jnp.asarray(
        10.0 ** rng.uniform(-3, 3, size=(1, 24)), jnp.float32
    )
    ref = (x * row_scale) @ (w * col_scale)
    got = int8_matmul(x * row_scale, w * col_scale)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), tree)


def test_quant_dense_param_tree_matches():
    x = jnp.ones((4, 16))
    ref = nn.Dense(8).init(jax.random.PRNGKey(0), x)
    got = QuantDense(features=8).init(jax.random.PRNGKey(0), x)
    assert _tree_shapes(ref) == _tree_shapes(got)


def test_quant_dense_general_param_tree_matches():
    x = jnp.ones((4, 16))
    ref = nn.DenseGeneral(features=(2, 8), use_bias=False).init(
        jax.random.PRNGKey(0), x
    )
    got = QuantDenseGeneral(features=(2, 8), use_bias=False).init(
        jax.random.PRNGKey(0), x
    )
    assert _tree_shapes(ref) == _tree_shapes(got)

    y = jnp.ones((4, 2, 8))
    ref2 = nn.DenseGeneral(features=16, axis=(-2, -1)).init(
        jax.random.PRNGKey(0), y
    )
    got2 = QuantDenseGeneral(features=16, axis=(-2, -1)).init(
        jax.random.PRNGKey(0), y
    )
    assert _tree_shapes(ref2) == _tree_shapes(got2)


def test_quantized_model_loads_fp_params_and_matches():
    """quantize=True shares the param tree with the fp model and tracks its
    outputs to within int8 rounding distance."""
    from tdspa.utils.testing import synthetic_batch, tiny_model_3d

    batch = synthetic_batch(
        jax.random.PRNGKey(0), batch=1, num_support=16, num_queries=8,
        num_frames=8, num_coords=3, with_features=True,
    )
    fp = tiny_model_3d(num_output_frames=8)
    q8 = tiny_model_3d(num_output_frames=8, quantize=True)
    params = fp.init(jax.random.PRNGKey(42), batch)["params"]
    # The SAME params apply to both models (checkpoint compatibility).
    out_fp = fp.apply({"params": params}, batch)
    out_q8 = q8.apply({"params": params}, batch)
    assert out_q8.tracks.shape == out_fp.tracks.shape
    err = np.linalg.norm(out_q8.tracks - out_fp.tracks) / (
        np.linalg.norm(out_fp.tracks) + 1e-9
    )
    assert err < 0.05, err
    # Visibility decisions must agree almost everywhere.
    agree = np.mean(
        (out_q8.visible_logits > 0) == (out_fp.visible_logits > 0)
    )
    assert agree > 0.97, agree
