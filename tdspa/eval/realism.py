"""Video realism scoring from track-reconstruction error.

The system's stated purpose (reference README.md:5) is evaluating video
realism via 3D semantic point trajectories: realistic motion compresses well
through the 128-token bottleneck, implausible motion doesn't. The reference
ships the autoencoder and a visualizer that consumes per-point
``coords_score`` arrays but no scorer producing them; this module closes that
loop.

``score_tracks`` runs encode -> decode on a set of tracks and returns
per-(frame, track) reconstruction error scores plus scalar video-level
aggregates. ``save_visualization_npz`` writes the exact npz contract the
visualizer CLI reads (coords, coords_score, video, intrinsics, extrinsics,
visibs — reference visualize.py:178-216).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _scorer(model):
    @jax.jit
    def run(params, batch):
        predictions = model.apply({"params": params}, batch)
        target = batch["query_tracks"]
        visible = batch["query_tracks_visible"][..., 0]
        err = jnp.linalg.norm(predictions.tracks - target, axis=-1)  # [B Q T]
        return err, predictions.visible_logits[..., 0], visible

    return run


def score_tracks(model, params, batch, error_scale: float = 10.0) -> dict:
    """Per-point realism scores from reconstruction error.

    Args:
      model: TrackAutoEncoder(3D) instance.
      params: model params.
      batch: model batch including query_tracks/query_tracks_visible targets.
      error_scale: error -> score mapping scale; score = exp(-scale * err).

    Returns:
      dict with
        'coords_score': [T Q] in [0, 1] (1 = perfectly reconstructed),
        'point_error': [Q T] raw reconstruction distance,
        'visible_agreement': fraction where predicted visibility matches,
        'realism_score': scalar visibility-weighted mean score,
        'mean_error': scalar visibility-weighted mean distance.
    """
    err, vis_logits, visible = _scorer(model)(params, batch)
    err = np.asarray(err[0])  # [Q T]
    visible = np.asarray(visible[0])  # [Q T]
    vis_pred = np.asarray(vis_logits[0]) > 0

    score = np.exp(-error_scale * err)  # [Q T] in (0, 1]
    weight = np.maximum(visible.sum(), 1.0)
    agree = float(((vis_pred == (visible > 0.5)).sum()) / visible.size)
    return {
        "coords_score": score.T.astype(np.float32),  # [T Q] (visualizer layout)
        "point_error": err.astype(np.float32),
        "visible_agreement": agree,
        "realism_score": float((score * visible).sum() / weight),
        "mean_error": float((err * visible).sum() / weight),
    }


def save_visualization_npz(
    path: str,
    coords,  # [T N 3]
    coords_score,  # [T N]
    video,  # [T H W 3] uint8 RGB
    intrinsics=None,  # [3 3] or [T 3 3]
    extrinsics=None,  # [4 4] or [T 4 4]
    visibs=None,  # [T N]
) -> None:
    """Write the visualizer-CLI input contract (visualize.py:178-216)."""
    video = np.asarray(video)
    video_tchw = np.transpose(video.astype(np.float32) / 255.0, (0, 3, 1, 2))
    t = np.asarray(coords).shape[0]
    if intrinsics is None:
        h, w = video.shape[1:3]
        f = float(max(h, w))
        intrinsics = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    if extrinsics is None:
        extrinsics = np.eye(4, dtype=np.float32)
    out = {
        "coords": np.asarray(coords, np.float32),
        "coords_score": np.asarray(coords_score, np.float32),
        "video": video_tchw.astype(np.float32),
        "intrinsics": np.asarray(intrinsics, np.float32),
        "extrinsics": np.asarray(extrinsics, np.float32),
    }
    if visibs is not None:
        out["visibs"] = np.asarray(visibs, np.float32)
    np.savez(path, **out)
