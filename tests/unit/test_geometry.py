"""Geometry ops vs the reference's NumPy loop semantics (exact oracles).

Oracles reimplement the documented per-(track, frame) formulas from the
reference (inference.py:287-447, visualize.py:15-44) as straightforward
Python loops; the vectorized XLA ops must match to float tolerance.
"""

import numpy as np
import jax.numpy as jnp

from tdspa.ops import (
    bilinear_sample,
    lift_2d_to_3d,
    project_3d_to_2d,
    project_all_tracks,
    sample_depth_features_for_tracks,
    sample_dino_features_for_tracks,
)

RNG = np.random.default_rng(0)


def _oracle_bilinear(grid, x, y, t):
    """Reference corner-clamped bilinear (inference.py:304-329)."""
    H, W = grid.shape[1], grid.shape[2]
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = x0 + 1, y0 + 1
    wx, wy = x - x0, y - y0
    x0, x1 = np.clip(x0, 0, W - 1), np.clip(x1, 0, W - 1)
    y0, y1 = np.clip(y0, 0, H - 1), np.clip(y1, 0, H - 1)
    return (
        grid[t, y0, x0] * (1 - wx) * (1 - wy)
        + grid[t, y0, x1] * wx * (1 - wy)
        + grid[t, y1, x0] * (1 - wx) * wy
        + grid[t, y1, x1] * wx * wy
    )


def _tracks(N, T, H, W, margin=3.0):
    # include out-of-bounds points to exercise clamping
    return np.stack(
        [
            RNG.uniform(-margin, W + margin, (N, T)),
            RNG.uniform(-margin, H + margin, (N, T)),
        ],
        axis=-1,
    ).astype(np.float32)


def test_bilinear_sample_matches_oracle():
    T, H, W, C = 4, 6, 7, 3
    grid = RNG.normal(size=(T, H, W, C)).astype(np.float32)
    tracks = _tracks(5, T, H, W)
    got = np.asarray(bilinear_sample(jnp.asarray(grid), jnp.asarray(tracks)))
    for n in range(5):
        for t in range(T):
            expected = _oracle_bilinear(grid, tracks[n, t, 0], tracks[n, t, 1], t)
            np.testing.assert_allclose(got[n, t], expected, atol=1e-4)


def test_lift_2d_to_3d_matches_oracle():
    T, H, W = 3, 8, 10
    depth = RNG.uniform(0.5, 5.0, (T, H, W, 1)).astype(np.float32)
    tracks = _tracks(4, T, H, W)
    got = np.asarray(lift_2d_to_3d(jnp.asarray(tracks), jnp.asarray(depth)))
    fx = fy = max(H, W)
    cx, cy = W / 2, H / 2
    for n in range(4):
        for t in range(T):
            x, y = tracks[n, t]
            z = _oracle_bilinear(depth, x, y, t)[0]
            np.testing.assert_allclose(
                got[n, t], [(x - cx) * z / fx, (y - cy) * z / fy, z], atol=1e-4
            )


def test_lift_with_explicit_intrinsics():
    T, H, W = 2, 4, 4
    depth = np.ones((T, H, W, 1), np.float32) * 2.0
    tracks = np.full((1, T, 2), 1.0, np.float32)
    got = np.asarray(
        lift_2d_to_3d(jnp.asarray(tracks), jnp.asarray(depth), (2.0, 4.0, 1.0, 1.0))
    )
    np.testing.assert_allclose(got[0, 0], [0.0, 0.0, 2.0])


def test_sample_dino_features_matches_oracle():
    T, Hp, Wp, D = 3, 5, 6, 4
    H, W = 70, 84  # 14 * patch grid
    feats = RNG.normal(size=(T, Hp, Wp, D)).astype(np.float32)
    tracks = _tracks(4, T, H, W)
    got = np.asarray(
        sample_dino_features_for_tracks(
            jnp.asarray(feats), jnp.asarray(tracks), (T, H, W, 3)
        )
    )
    sh, sw = Hp / H, Wp / W
    for n in range(4):
        for t in range(T):
            x, y = tracks[n, t]
            expected = _oracle_bilinear(feats, x * sw, y * sh, t)
            np.testing.assert_allclose(got[n, t], expected, atol=1e-4)


def test_sample_depth_features_matches_oracle():
    T, H, W = 4, 6, 6
    depth = RNG.uniform(0.5, 8.0, (T, H, W, 1)).astype(np.float32)
    tracks = _tracks(3, T, H, W)
    got = np.asarray(
        sample_depth_features_for_tracks(jnp.asarray(depth), jnp.asarray(tracks))
    )
    assert got.shape == (3, T, 256)
    for n in range(3):
        d_prev = None
        for t in range(T):
            x, y = tracks[n, t]
            d = _oracle_bilinear(depth, x, y, t)[0]
            np.testing.assert_allclose(got[n, t, 0], d, atol=1e-4)
            np.testing.assert_allclose(got[n, t, 1], d / 10.0, atol=1e-4)
            expected_grad = 0.0 if t == 0 else d - d_prev
            np.testing.assert_allclose(got[n, t, 2], expected_grad, atol=1e-4)
            np.testing.assert_array_equal(got[n, t, 3:], 0.0)
            d_prev = d


def test_project_3d_to_2d_matches_oracle():
    N = 6
    pts = RNG.normal(size=(N, 3)).astype(np.float32) + [0, 0, 4.0]
    intr = np.array([[100.0, 0, 32], [0, 110.0, 24], [0, 0, 1]], np.float32)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, 3] = [0.1, -0.2, 0.5]
    got_xy, got_z = project_3d_to_2d(
        jnp.asarray(pts), jnp.asarray(intr), jnp.asarray(extr)
    )
    homo = np.concatenate([pts, np.ones((N, 1))], axis=1)
    cam = (extr @ homo.T).T
    proj = (intr @ cam[:, :3].T).T
    expected = proj[:, :2] / (proj[:, 2:3] + 1e-8)
    np.testing.assert_allclose(np.asarray(got_xy), expected, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_z), cam[:, 2], atol=1e-4)


def test_project_all_tracks_shapes_and_clipping():
    T, N = 3, 5
    coords = RNG.normal(size=(T, N, 3)).astype(np.float32) + [0, 0, 5.0]
    intr = np.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]], np.float32)
    extr = np.eye(4, dtype=np.float32)
    out = np.asarray(
        project_all_tracks(
            jnp.asarray(coords),
            jnp.asarray(intr),
            jnp.asarray(extr),
            resize_height=64,
            resize_width=64,
            original_height=32,
            original_width=32,
        )
    )
    assert out.shape == (N, T, 2)
    assert (out[..., 0] >= 0).all() and (out[..., 0] <= 31).all()
    assert (out[..., 1] >= 0).all() and (out[..., 1] <= 31).all()
    # Scaled projection followed by inverse scaling must equal direct
    # projection (before clipping) when within bounds.
    direct = (intr @ (extr @ np.concatenate(
        [coords[0], np.ones((N, 1))], axis=1).T)[:3]).T
    direct_xy = direct[:, :2] / (direct[:, 2:3] + 1e-8)
    inside = (
        (direct_xy[:, 0] >= 0) & (direct_xy[:, 0] <= 31)
        & (direct_xy[:, 1] >= 0) & (direct_xy[:, 1] <= 31)
    )
    np.testing.assert_allclose(out[inside, 0], direct_xy[inside], atol=1e-3)
