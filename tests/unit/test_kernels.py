"""Pallas kernels vs their XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tdspa.kernels.bilinear import bilinear_sample_pallas
from tdspa.ops.geometry import bilinear_sample

RNG = np.random.default_rng(0)


def test_bilinear_pallas_matches_xla():
    T, H, W, C, N = 3, 7, 9, 8, 11
    grid = RNG.normal(size=(T, H, W, C)).astype(np.float32)
    coords = np.stack(
        [RNG.uniform(-2, W + 2, (N, T)), RNG.uniform(-2, H + 2, (N, T))], -1
    ).astype(np.float32)
    ref = np.asarray(bilinear_sample(jnp.asarray(grid), jnp.asarray(coords)))
    got = np.asarray(
        bilinear_sample_pallas(jnp.asarray(grid), jnp.asarray(coords), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_bilinear_pallas_dino_shapes():
    # DINO-like grid: [T, 5, 6, 16] with N=20 tracks.
    T, H, W, C, N = 2, 5, 6, 16, 20
    grid = RNG.normal(size=(T, H, W, C)).astype(np.float32)
    coords = np.stack(
        [RNG.uniform(0, W - 1, (N, T)), RNG.uniform(0, H - 1, (N, T))], -1
    ).astype(np.float32)
    ref = np.asarray(bilinear_sample(jnp.asarray(grid), jnp.asarray(coords)))
    got = np.asarray(
        bilinear_sample_pallas(jnp.asarray(grid), jnp.asarray(coords), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
