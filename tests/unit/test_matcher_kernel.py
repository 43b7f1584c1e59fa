"""Parity: Pallas matcher cost-patch kernel vs the XLA oracle.

Convention per CLAUDE.md: interpret-mode parity here; the real-chip compile
check lives in the on-TPU drive (docs/BENCHMARKS.md records it) because
interpret mode validates neither Mosaic block rules nor the VMEM budget.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdspa.features.matcher import (
    _cost_patches,
    img_to_feat,
    init_matcher,
    refine_tracks,
)
from tdspa.kernels.matcher import cost_patches_pallas


def _random_feats(key, t, hf, wf, dim):
    f = jax.random.normal(key, (t, hf, wf, dim), jnp.float32)
    return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-6)


@pytest.mark.parametrize("radius,dim", [(4, 16), (3, 16), (4, 8)])
def test_cost_patches_matches_xla_interior(radius, dim):
    t, hf, wf, n, stride = 3, 32, 48, 13, 2
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    feats = _random_feats(k0, t, hf, wf, dim)
    tvec = jax.random.normal(k1, (n, dim), jnp.float32)
    # Interior positions: the whole span-window stays inside the feature
    # map, where kernel (inward-shift) and XLA (edge-clamp) semantics agree.
    lo, hi_x, hi_y = radius + 2, wf - radius - 3, hf - radius - 3
    fpos = jax.random.uniform(
        k2, (n, t, 2), jnp.float32,
        minval=lo, maxval=min(hi_x, hi_y),
    )
    pos_img = fpos * stride + (stride - 1)  # exact inverse of img_to_feat
    ref = _cost_patches(feats, tvec, pos_img, radius, stride)
    got = cost_patches_pallas(feats, tvec, fpos, radius, interpret=True)
    assert got.shape == ref.shape == (n, t, (2 * radius + 1) ** 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_cost_patches_border_finite():
    """Border windows shift inward: values finite, interior points exact."""
    t, hf, wf, dim, radius = 2, 32, 32, 16, 4
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    feats = _random_feats(k0, t, hf, wf, dim)
    tvec = jax.random.normal(k1, (4, dim), jnp.float32)
    fpos = jnp.asarray(
        [[[0.0, 0.0]] * t, [[31.5, 31.5]] * t, [[0.2, 16.0]] * t,
         [[16.0, 16.0]] * t],
        jnp.float32,
    )
    got = cost_patches_pallas(feats, tvec, fpos, radius, interpret=True)
    assert bool(jnp.isfinite(got).all())
    # The fully-interior point still matches the oracle exactly.
    ref = _cost_patches(
        feats, tvec, fpos * 2 + 1, radius, 2
    )
    np.testing.assert_allclose(
        np.asarray(got[3]), np.asarray(ref[3]), atol=1e-4
    )


@pytest.mark.parametrize("m", [1, 5])
def test_cost_patches_multi_matches_xla_interior(m):
    """Bank variant: M templates per point in one kernel pass (shared strip
    loads) == the XLA multi oracle on interior points."""
    from tdspa.features.matcher import _cost_patches_multi
    from tdspa.kernels.matcher import cost_patches_multi_pallas

    t, hf, wf, n, dim, radius, stride = 3, 32, 48, 11, 16, 4, 2
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(3), 3)
    feats = _random_feats(k0, t, hf, wf, dim)
    tvecs = jax.random.normal(k1, (n, m, dim), jnp.float32)
    lo, hi = radius + 2, min(wf, hf) - radius - 3
    fpos = jax.random.uniform(
        k2, (n, t, 2), jnp.float32, minval=lo, maxval=hi
    )
    pos_img = fpos * stride + (stride - 1)
    ref = _cost_patches_multi(feats, tvecs, pos_img, radius, stride)
    got = cost_patches_multi_pallas(feats, tvecs, fpos, radius,
                                    interpret=True)
    assert got.shape == ref.shape == (n, t, m, (2 * radius + 1) ** 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_refine_tracks_bank_pallas_backend_matches_xla():
    """Two-phase bank refinement through the multi kernel == the XLA path."""
    params = init_matcher(jax.random.PRNGKey(4), bank=3)
    video = np.random.default_rng(2).integers(
        0, 255, (6, 64, 96, 3), dtype=np.uint8
    )
    tracks = np.random.default_rng(3).uniform(
        24, 40, (9, 6, 2)
    ).astype(np.float32)
    p_xla, v_xla = refine_tracks(params, video, tracks, backend="xla")
    p_pal, v_pal = refine_tracks(
        params, video, tracks, backend="pallas_interpret"
    )
    np.testing.assert_allclose(
        np.asarray(p_pal), np.asarray(p_xla), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_pal), np.asarray(v_xla), atol=1e-3
    )


def test_refine_tracks_pallas_backend_matches_xla():
    """End-to-end refine parity: the kernel-backed path == the XLA path
    (interior tracks; both iterations go through the cost kernel)."""
    params = init_matcher(jax.random.PRNGKey(2))
    video = np.random.default_rng(0).integers(
        0, 255, (4, 64, 96, 3), dtype=np.uint8
    )
    tracks = np.random.default_rng(1).uniform(
        24, 40, (9, 4, 2)
    ).astype(np.float32)
    p_xla, v_xla = refine_tracks(params, video, tracks, backend="xla")
    p_pal, v_pal = refine_tracks(
        params, video, tracks, backend="pallas_interpret"
    )
    np.testing.assert_allclose(
        np.asarray(p_pal), np.asarray(p_xla), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_pal), np.asarray(v_xla), atol=1e-3
    )
