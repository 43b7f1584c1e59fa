"""TAPVid-3D evaluation harness.

The working counterpart of reference evaluate_tapvid3d.py:39-244 with its
latent defects fixed (SURVEY §2.9):

* the forward pass alone is jitted; metric math runs on host over numpy
  (the reference jits a function that calls numpy on tracers — Q2);
* model query points are built as (t, x, y, z) from the ground-truth 3D
  track at the query frame (the reference feeds (x, y, t) pixel-space
  queries straight into a (t, x, y, z) contract — Q7);
* TPU-friendly static shapes: every video is padded to shape buckets
  (tracks to a multiple of ``track_bucket``, frames to the model's T) so the
  jitted forward compiles once per bucket instead of once per video;
  padded queries are dropped before metrics.

Support tracks are the query tracks themselves ("for now" in the reference,
evaluate_tapvid3d.py:336) — kept, since TAPVid-3D ground truth has no
separate support set.
"""

from __future__ import annotations

import functools

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from tdspa.eval.tapvid3d_metrics import compute_tapvid3d_metrics, zero_metrics
from tdspa.models import TrackAutoEncoder3D


def convert_predictions_to_tapvid3d_format(predictions, query_points=None):
    """[B Q T 3] predictions -> ([T N 3] tracks, [T N] occluded) numpy.

    Occluded = visibility logit <= 0 (reference evaluate_tapvid3d.py:39-59).
    """
    del query_points
    pred_tracks = np.asarray(predictions.tracks)[0]  # [Q T 3]
    pred_tracks = np.transpose(pred_tracks, (1, 0, 2))  # [T Q 3]
    pred_occluded = np.asarray(predictions.visible_logits)[0, :, :, 0] <= 0.0
    return pred_tracks, np.transpose(pred_occluded, (1, 0))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_example_to_bucket(tracks, visible, query_points, num_frames, track_bucket):
    """Pad [N T 3]/[N T 1]/[Q 4] to static bucket shapes.

    Frames pad to ``num_frames`` (masked past ``boundary_frame``); tracks and
    queries pad to the next multiple of ``track_bucket`` (padded tracks are
    marked invisible so they are masked out of encoder attention; padded
    queries are sliced off the predictions).
    """
    n, t = tracks.shape[:2]
    q = query_points.shape[0]
    n_pad = _round_up(max(n, 1), track_bucket)
    q_pad = _round_up(max(q, 1), track_bucket)
    t_pad = num_frames

    tracks_p = np.zeros((n_pad, t_pad, tracks.shape[-1]), np.float32)
    tracks_p[:n, : min(t, t_pad)] = tracks[:, :t_pad]
    visible_p = np.zeros((n_pad, t_pad, 1), np.float32)
    visible_p[:n, : min(t, t_pad)] = visible[:, :t_pad]
    queries_p = np.zeros((q_pad, query_points.shape[-1]), np.float32)
    queries_p[:q] = query_points
    return tracks_p, visible_p, queries_p, min(t, t_pad)


@functools.lru_cache(maxsize=8)
def _jitted_forward_for(model):
    """One compiled forward per (hashable) model config."""

    @jax.jit
    def forward(params, batch):
        return model.apply({"params": params}, batch)

    return forward


def _jitted_forward(num_output_frames, use_dino, use_depth, model=None):
    if model is None:
        model = TrackAutoEncoder3D(
            num_output_frames=num_output_frames,
            use_dino=use_dino,
            use_depth=use_depth,
        )
    return _jitted_forward_for(model)


def evaluate_batch(
    params,
    batch,
    num_output_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    scaling: str = "per_trajectory",
    model=None,
):
    """Forward on device + metrics on host for one prepared batch.

    Returns (metrics dict, predictions) like the reference
    (evaluate_tapvid3d.py:62-115).
    """
    forward = _jitted_forward(num_output_frames, use_dino, use_depth, model)
    predictions = forward(params, batch)

    query_points = np.asarray(batch["query_points"][0])
    pred_tracks, pred_occluded = convert_predictions_to_tapvid3d_format(predictions)

    gt_tracks = np.transpose(np.asarray(batch["query_tracks"][0]), (1, 0, 2))
    gt_occluded = np.transpose(
        np.logical_not(np.asarray(batch["query_tracks_visible"][0, :, :, 0])), (1, 0)
    )
    if "intrinsics" not in batch:
        raise ValueError(
            "evaluate_batch: batch has no 'intrinsics' (fx, fy, cx, cy). "
            "TAPVid-3D metrics project 3D tracks through the camera; "
            "fabricating intrinsics silently corrupts every pixel-threshold "
            "metric, so they are required."
        )
    intrinsics = np.asarray(batch["intrinsics"][0])

    metrics = compute_tapvid3d_metrics(
        gt_occluded=gt_occluded,
        gt_tracks=gt_tracks,
        pred_occluded=pred_occluded,
        pred_tracks=pred_tracks,
        intrinsics_params=intrinsics,
        scaling=scaling,
        query_points=query_points[:, ::-1],  # reference layout: (t, y, x)
        order="t n",
    )
    return {k: float(v) for k, v in metrics.items()}, predictions


def build_eval_batch(example, num_output_frames: int = 150, track_bucket: int = 256):
    """Model batch from a TAPVid-3D ground-truth example.

    ``queries_xyt`` carries (x, y, t) pixel-space queries; the model contract
    is (t, x, y, z) in 3D camera space, so query points are rebuilt from the
    ground-truth 3D track at the query frame (intended behavior of reference
    evaluate_tapvid3d.py:331-339, fixing Q7). Support := query tracks.
    """
    tracks = np.asarray(example["tracks_3d"], np.float32)  # [N T 3]
    visible = np.asarray(example["visible"], np.float32)
    if visible.ndim == 2:
        visible = visible[..., None]
    queries_xyt = np.asarray(example["queries_xyt"], np.float32)  # [N 3] (x,y,t)

    n, t = tracks.shape[:2]
    qf = np.clip(np.round(queries_xyt[:, 2]).astype(int), 0, t - 1)
    coords = tracks[np.arange(n), qf]  # [N 3]
    query_points = np.concatenate(
        [qf[:, None].astype(np.float32), coords], axis=1
    )  # [N 4] (t, x, y, z)

    tracks_p, visible_p, queries_p, t_used = pad_example_to_bucket(
        tracks, visible, query_points, num_output_frames, track_bucket
    )
    batch = {
        "support_tracks": jnp.asarray(tracks_p[np.newaxis]),
        "support_tracks_visible": jnp.asarray(visible_p[np.newaxis]),
        "query_points": jnp.asarray(queries_p[np.newaxis]),
        "query_tracks": jnp.asarray(tracks_p[np.newaxis]),
        "query_tracks_visible": jnp.asarray(visible_p[np.newaxis]),
        "boundary_frame": jnp.asarray([t_used]),
    }
    intr = (example["intrinsics"] if "intrinsics" in example
            else example["fx_fy_cx_cy"] if "fx_fy_cx_cy" in example else None)
    if intr is not None:
        batch["intrinsics"] = jnp.asarray(
            np.asarray(intr, np.float32)[np.newaxis]
        )
    meta = {"num_tracks": n, "num_frames": t_used, "queries_xyt": queries_xyt}
    return batch, meta


def evaluate_video(
    params,
    example,
    num_output_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    depth_scalings=("median", "per_trajectory"),
    track_bucket: int = 256,
    model=None,
):
    """Per-video metrics dict {scaling: metrics} with zero-fallback."""
    if "intrinsics" not in example and "fx_fy_cx_cy" not in example:
        raise ValueError(
            "evaluate_video: example has no intrinsics ('intrinsics' or "
            "'fx_fy_cx_cy'). TAPVid-3D npz files carry fx_fy_cx_cy "
            "(reference evaluate_tapvid3d.py:322-327); refusing to fabricate "
            "camera parameters."
        )
    batch, meta = build_eval_batch(example, num_output_frames, track_bucket)
    forward = _jitted_forward(num_output_frames, use_dino, use_depth, model)
    predictions = forward(params, batch)

    n, t = meta["num_tracks"], meta["num_frames"]
    pred_tracks, pred_occluded = convert_predictions_to_tapvid3d_format(predictions)
    pred_tracks = pred_tracks[:t, :n]
    pred_occluded = pred_occluded[:t, :n]

    gt_tracks = np.transpose(np.asarray(example["tracks_3d"])[:, :t], (1, 0, 2))
    vis = np.asarray(example["visible"])
    if vis.ndim == 3:
        vis = vis[..., 0]
    gt_occluded = np.transpose(~vis[:, :t].astype(bool), (1, 0))
    intrinsics = np.asarray(
        example["intrinsics"] if "intrinsics" in example
        else example["fx_fy_cx_cy"]
    )

    video_metrics = {}
    for scaling in depth_scalings:
        try:
            m = compute_tapvid3d_metrics(
                gt_occluded=gt_occluded,
                gt_tracks=gt_tracks,
                pred_occluded=pred_occluded,
                pred_tracks=pred_tracks,
                intrinsics_params=intrinsics,
                scaling=scaling,
                query_points=meta["queries_xyt"][:, ::-1],
                order="t n",
            )
            video_metrics[scaling] = {k: float(v) for k, v in m.items()}
        except Exception as e:  # noqa: BLE001 - reference zero-fallback
            logging.warning("Metrics failed (scaling=%s): %s", scaling, e)
            video_metrics[scaling] = zero_metrics()
    return video_metrics


def aggregate_metrics(per_video: list[dict], depth_scalings) -> dict:
    """mean/std aggregation matching reference evaluate_tapvid3d.py:399-407."""
    out: dict = {}
    for scaling in depth_scalings:
        out[scaling] = {}
        if not per_video:
            continue
        for key in per_video[0][scaling]:
            values = [v[scaling][key] for v in per_video]
            out[scaling][key] = float(np.mean(values))
            out[scaling][f"{key}_std"] = float(np.std(values))
    return out


def _video_metrics(example, pred_tracks, pred_occluded, n, t, queries_xyt,
                   depth_scalings):
    """Host-side metrics for one video's (sliced) predictions."""
    gt_tracks = np.transpose(np.asarray(example["tracks_3d"])[:, :t], (1, 0, 2))
    vis = np.asarray(example["visible"])
    if vis.ndim == 3:
        vis = vis[..., 0]
    gt_occluded = np.transpose(~vis[:, :t].astype(bool), (1, 0))
    intrinsics = np.asarray(
        example["intrinsics"] if "intrinsics" in example
        else example["fx_fy_cx_cy"]
    )
    video_metrics = {}
    for scaling in depth_scalings:
        try:
            m = compute_tapvid3d_metrics(
                gt_occluded=gt_occluded,
                gt_tracks=gt_tracks,
                pred_occluded=pred_occluded,
                pred_tracks=pred_tracks,
                intrinsics_params=intrinsics,
                scaling=scaling,
                query_points=queries_xyt[:, ::-1],
                order="t n",
            )
            video_metrics[scaling] = {k: float(v) for k, v in m.items()}
        except Exception as e:  # noqa: BLE001 - reference zero-fallback
            logging.warning("Metrics failed (scaling=%s): %s", scaling, e)
            video_metrics[scaling] = zero_metrics()
    return video_metrics


def evaluate_model(
    params,
    dataset,
    num_output_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    depth_scalings=("median", "per_trajectory"),
    track_bucket: int = 256,
    batch_size: int = 8,
    model=None,
) -> dict:
    """Evaluate over an iterable of ground-truth examples; returns
    {scaling: aggregated metrics} (reference evaluate_tapvid3d.py:144-244).

    Videos whose bucket-padded shapes match stack into ``batch_size``-sized
    forwards (the reference's batch-8 operating point,
    evaluate_tapvid3d.py:28); partial groups pad by repeating the last
    video, so each bucket shape compiles exactly once. Metrics stay
    per-video on host.
    """
    forward = _jitted_forward(num_output_frames, use_dino, use_depth, model)
    per_video: list[dict] = []

    def flush(items):
        if not items:
            return
        real = len(items)
        target = 1
        while target < real:
            target *= 2
        # Never pad beyond the user's batch_size (a batch of 6 pads to 8
        # otherwise, exceeding the requested memory/compute envelope).
        target = min(target, batch_size)
        while len(items) < target:
            # Pad partial groups to the next power of two by repeating the
            # last video (results dropped): bounds both compile count
            # (<= log2(batch_size) variants per bucket) and padding waste
            # (< 2x), vs 8x waste if singletons padded straight to 8.
            items.append(items[-1])
        stacked = {
            k: jnp.concatenate([b[k] for (b, _, _) in items], axis=0)
            for k in items[0][0]
        }
        predictions = forward(params, stacked)
        all_tracks = np.asarray(predictions.tracks)  # [B Q T 3]
        all_occ = np.asarray(predictions.visible_logits)[..., 0] <= 0.0
        for i, (_, meta, example) in enumerate(items[:real]):
            n, t = meta["num_tracks"], meta["num_frames"]
            pred_tracks = np.transpose(all_tracks[i], (1, 0, 2))[:t, :n]
            pred_occluded = np.transpose(all_occ[i], (1, 0))[:t, :n]
            per_video.append(
                _video_metrics(example, pred_tracks, pred_occluded, n, t,
                               meta["queries_xyt"], depth_scalings)
            )

    groups: dict = {}
    for example in dataset:
        if "intrinsics" not in example and "fx_fy_cx_cy" not in example:
            raise ValueError(
                "evaluate_model: example has no intrinsics ('intrinsics' or "
                "'fx_fy_cx_cy'); refusing to fabricate camera parameters."
            )
        batch, meta = build_eval_batch(example, num_output_frames, track_bucket)
        key = tuple(
            (k, tuple(batch[k].shape)) for k in sorted(batch)
        )
        groups.setdefault(key, []).append((batch, meta, example))
        if len(groups[key]) == batch_size:
            flush(groups.pop(key))
    for items in groups.values():
        flush(items)
    return aggregate_metrics(per_video, depth_scalings)
