"""Geometry / sampling ops: 2D->3D lifting, feature sampling, projection.

These replace the reference's O(N*T) Python-level double loops
(inference.py:287-447, visualize.py:15-44,125-175) — the dominant CPU cost of
the reference inference pipeline (~1.2M loop iterations at N=4096, T=150) —
with fully vectorized XLA programs that run on-device inside ``jit``. Each
function's numerical semantics match the reference NumPy code exactly (the
reference loops are the test oracles; see tests/unit/test_geometry.py),
including the corner-clamping convention: interpolation weights come from the
*unclamped* floor, corner indices are clamped to the grid independently.

A fused Pallas gather+interp kernel for the [T,Hp,Wp,768] DINO grid lives in
``tdspa.kernels.bilinear``; these XLA versions are the reference path and the
fallback on non-TPU backends.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(grid, coords):
    """Bilinear interpolation on a per-frame grid at per-frame track coords.

    Args:
      grid: float[T H W C] values.
      coords: float[N T 2] (x, y) positions in grid-pixel coordinates.

    Returns:
      float[N T C] interpolated values.

    Semantics match the reference inner loop (inference.py:304-329): corners
    floor/floor+1, clamped to bounds independently; weights from the
    unclamped floor — points outside the grid clamp to edge values with
    out-of-range weights, exactly as the reference computes them.
    """
    height, width = grid.shape[1], grid.shape[2]
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., jnp.newaxis]
    wy = (y - y0f)[..., jnp.newaxis]

    x0 = jnp.clip(x0f.astype(jnp.int32), 0, width - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, width - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, height - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, height - 1)

    t_idx = jnp.arange(grid.shape[0])[jnp.newaxis, :]  # [1 T] broadcasts over N
    g00 = grid[t_idx, y0, x0]  # [N T C]
    g01 = grid[t_idx, y0, x1]
    g10 = grid[t_idx, y1, x0]
    g11 = grid[t_idx, y1, x1]

    return (
        g00 * (1 - wx) * (1 - wy)
        + g01 * wx * (1 - wy)
        + g10 * (1 - wx) * wy
        + g11 * wx * wy
    )


def lift_2d_to_3d(tracks_2d, depth, intrinsics=None):
    """Lift 2D tracks to 3D camera coordinates via bilinear depth sampling.

    Args:
      tracks_2d: float[N T 2] (x, y) pixel tracks.
      depth: float[T H W 1] depth maps.
      intrinsics: optional (fx, fy, cx, cy); defaults to fx=fy=max(H, W),
        cx=W/2, cy=H/2 (reference inference.py:297-300).

    Returns:
      float[N T 3] (X, Y, Z) with X=(x-cx)Z/fx, Y=(y-cy)Z/fy
      (reference inference.py:287-336).
    """
    if intrinsics is None:
        height, width = depth.shape[1], depth.shape[2]
        fx = fy = float(max(height, width))
        cx, cy = width / 2.0, height / 2.0
    else:
        fx, fy, cx, cy = intrinsics

    z = bilinear_sample(depth, tracks_2d)[..., 0]  # [N T]
    x = tracks_2d[..., 0]
    y = tracks_2d[..., 1]
    return jnp.stack(
        [(x - cx) * z / fx, (y - cy) * z / fy, z], axis=-1
    ).astype(jnp.float32)


def sample_dino_features_for_tracks(dino_features, tracks_2d, video_shape):
    """Sample DINOv2 patch features at 2D track locations.

    Args:
      dino_features: float[T Hp Wp D] patch-grid features.
      tracks_2d: float[N T 2] (x, y) in original image pixels.
      video_shape: (T, H, W, 3) of the original video.

    Returns:
      float[N T D] per-track features (reference inference.py:339-395):
      pixel coords scaled by patches/pixels, then bilinear on the patch grid.
    """
    if dino_features is None:
        return None
    h_patches, w_patches = dino_features.shape[1], dino_features.shape[2]
    _, height, width = video_shape[:3]
    scale = jnp.asarray(
        [w_patches / width, h_patches / height], dtype=jnp.float32
    )
    return bilinear_sample(dino_features, tracks_2d * scale).astype(jnp.float32)


def sample_depth_features_for_tracks(depth, tracks_2d, feature_dim: int = 256):
    """Hand-crafted 256-d depth features at track locations.

    Channels (reference inference.py:398-447): [0] bilinear depth d,
    [1] d/10, [2] temporal gradient d_t - d_{t-1} (0 at t=0), rest zeros.
    """
    if depth is None:
        return None
    d = bilinear_sample(depth, tracks_2d)[..., 0]  # [N T]
    d_grad = jnp.concatenate(
        [jnp.zeros_like(d[..., :1]), d[..., 1:] - d[..., :-1]], axis=-1
    )
    num_tracks, num_frames = d.shape
    zeros = jnp.zeros((num_tracks, num_frames, feature_dim - 3), d.dtype)
    return jnp.concatenate(
        [d[..., None], (d / 10.0)[..., None], d_grad[..., None], zeros], axis=-1
    ).astype(jnp.float32)


def project_3d_to_2d(coords_3d, intrinsics, extrinsics):
    """Project [N 3] world points to 2D via [4 4] extrinsics + [3 3] intrinsics.

    Returns (coords_2d [N 2], depths [N]); NaN/inf replaced with 0
    (reference visualize.py:15-44). The perspective divide adds 1e-8 like the
    reference.
    """
    ones = jnp.ones_like(coords_3d[..., :1])
    homo = jnp.concatenate([coords_3d, ones], axis=-1)  # [N 4]
    cam = homo @ extrinsics.T  # [N 4]
    depths = cam[..., 2]
    proj = cam[..., :3] @ intrinsics.T  # [N 3]
    coords_2d = proj[..., :2] / (proj[..., 2:3] + 1e-8)
    coords_2d = jnp.nan_to_num(coords_2d, nan=0.0, posinf=0.0, neginf=0.0)
    depths = jnp.nan_to_num(depths, nan=0.0, posinf=0.0, neginf=0.0)
    return coords_2d, depths


def project_all_tracks(
    coords_3d,
    intrinsics,
    extrinsics,
    resize_height: int = 1024,
    resize_width: int = 1024,
    original_height: int | None = None,
    original_width: int | None = None,
):
    """Project [T N 3] tracks for all frames with resize-scaled intrinsics.

    Mirrors reference visualize.py:125-175: fx/cx scaled by
    resize_width/original_width (fy/cy by height ratio), projected, scaled
    back, clipped to original image bounds. Returns float[N T 2].
    """
    num_frames = coords_3d.shape[0]
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(
            intrinsics, (num_frames,) + intrinsics.shape
        )
    if extrinsics.ndim == 2:
        extrinsics = jnp.broadcast_to(
            extrinsics, (num_frames,) + extrinsics.shape
        )
    original_height = 512 if original_height is None else original_height
    original_width = 512 if original_width is None else original_width
    scale_x = resize_width / original_width
    scale_y = resize_height / original_height

    scale_mat = jnp.asarray(
        [[scale_x, 1.0, scale_x], [1.0, scale_y, scale_y], [1.0, 1.0, 1.0]]
    )
    intr_scaled = intrinsics * scale_mat  # scales fx, fy, cx, cy entries

    ones = jnp.ones_like(coords_3d[..., :1])
    homo = jnp.concatenate([coords_3d, ones], axis=-1)  # [T N 4]
    cam = jnp.einsum("tij,tnj->tni", extrinsics, homo)
    proj = jnp.einsum("tij,tnj->tni", intr_scaled, cam[..., :3])
    coords_2d = proj[..., :2] / (proj[..., 2:3] + 1e-8)
    coords_2d = jnp.nan_to_num(coords_2d, nan=0.0, posinf=0.0, neginf=0.0)

    x = jnp.clip(coords_2d[..., 0] / scale_x, 0, original_width - 1)
    y = jnp.clip(coords_2d[..., 1] / scale_y, 0, original_height - 1)
    return jnp.stack([x, y], axis=-1).transpose(1, 0, 2)  # [N T 2]
