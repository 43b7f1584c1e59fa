"""Unit tests: sinusoidal embedding closed form + ParamStateInit broadcast."""

import jax
import jax.numpy as jnp
import numpy as np

from tdspa.core.embeddings import ParamStateInit, SinusoidalEmbedding


def test_sinusoid_closed_form():
    F = 8
    emb = SinusoidalEmbedding(num_frequencies=F)
    x = jnp.array([[0.3, -1.2, 4.0]])
    out = emb.apply({}, x)
    assert out.shape == (1, 3 * 2 * F)

    # Layout: per coordinate, F sin values then F cos values.
    expected = []
    for c in range(3):
        xc = float(x[0, c])
        sins = [np.sin(xc * 2 ** (i / 3)) for i in range(F)]
        coss = [np.cos(xc * 2 ** (i / 3)) for i in range(F)]
        expected.extend(sins + coss)
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-5)


def test_sinusoid_output_dims():
    # With F=32: 2D (x,y,t) -> 192; 3D (x,y,z,t) -> 256 channels.
    emb = SinusoidalEmbedding(num_frequencies=32)
    assert emb.apply({}, jnp.zeros((2, 5, 3))).shape == (2, 5, 192)
    assert emb.apply({}, jnp.zeros((2, 5, 4))).shape == (2, 5, 256)


def test_param_state_init_broadcast():
    mod = ParamStateInit(shape=(4, 7))
    variables = mod.init(jax.random.PRNGKey(0), (2, 3))
    out = mod.apply(variables, (2, 3))
    assert out.shape == (2, 3, 4, 7)
    # Broadcast copies, not re-samples.
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(out[1, 2]))
    assert "state_init" in variables["params"]
