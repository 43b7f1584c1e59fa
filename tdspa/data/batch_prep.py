"""Batch preparation: support/query split + query-point sampling.

Reference semantics (data_loader.py:13-110): a random permutation assigns the
first ``num_support_tracks`` tracks to the support set and the next
``num_query_tracks`` to the query set; each query point is the query track's
position at one uniformly random frame, laid out (t, *coords).

Two implementations:

* ``prepare_2d_batch`` / ``prepare_3d_batch`` — host-side, numpy-RNG,
  signature-compatible with the reference (single example -> batch-of-1).
* ``split_and_sample_queries`` — the device-side jit-able equivalent over
  already-batched arrays with an explicit ``jax.random`` key (reproducible,
  fuses into the inference pipeline so the split never leaves the chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sample_query_points(query_tracks, num_frames, rng):
    """Host-side (t, *coords) sampling at a random frame per query track."""
    num_queries, track_frames = query_tracks.shape[:2]
    ts = rng.integers(0, num_frames, size=num_queries)
    ts_clipped = np.minimum(ts, track_frames - 1)
    coords = query_tracks[np.arange(num_queries), ts_clipped]
    return np.concatenate([ts[:, None].astype(coords.dtype), coords], axis=1)


def _prepare_batch(
    example,
    tracks_key: str,
    num_support_tracks: int,
    num_query_tracks: int,
    num_frames: int,
    use_dino: bool = False,
    use_depth: bool = False,
    seed: int | None = None,
):
    tracks = np.asarray(example[tracks_key])
    visible = np.asarray(example["visible"])
    rng = np.random.default_rng(seed)

    indices = rng.permutation(tracks.shape[0])
    support_idx = indices[:num_support_tracks]
    query_idx = indices[num_support_tracks : num_support_tracks + num_query_tracks]

    support_tracks = tracks[support_idx]
    query_tracks = tracks[query_idx]
    query_points = _sample_query_points(query_tracks, num_frames, rng)

    batch = {
        "support_tracks": jnp.array(support_tracks[np.newaxis]),
        "support_tracks_visible": jnp.array(visible[support_idx][np.newaxis]),
        "query_points": jnp.array(query_points[np.newaxis]),
        "query_tracks": jnp.array(query_tracks[np.newaxis]),
        "query_tracks_visible": jnp.array(visible[query_idx][np.newaxis]),
        "boundary_frame": jnp.array([num_frames]),
    }
    if use_dino and "dino_features" in example:
        batch["dino_features"] = jnp.array(
            np.asarray(example["dino_features"])[support_idx][np.newaxis]
        )
    if use_depth and "depth_features" in example:
        batch["depth_features"] = jnp.array(
            np.asarray(example["depth_features"])[support_idx][np.newaxis]
        )
    return batch


def prepare_2d_batch(
    example,
    num_support_tracks: int = 2048,
    num_query_tracks: int = 2048,
    num_frames: int = 150,
    seed: int | None = None,
):
    """2D TRAJAN batch from one example dict with 'tracks' [N T 2]."""
    return _prepare_batch(
        example,
        "tracks",
        num_support_tracks,
        num_query_tracks,
        num_frames,
        seed=seed,
    )


def prepare_3d_batch(
    example,
    num_support_tracks: int = 2048,
    num_query_tracks: int = 2048,
    num_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    seed: int | None = None,
):
    """3DSPA batch from one example dict with 'tracks_3d' [N T 3]."""
    return _prepare_batch(
        example,
        "tracks_3d",
        num_support_tracks,
        num_query_tracks,
        num_frames,
        use_dino=use_dino,
        use_depth=use_depth,
        seed=seed,
    )


def split_and_sample_queries(
    key,
    tracks,  # float[N T C]
    visible,  # float[N T 1]
    num_support: int,
    num_queries: int,
    num_frames: int,
    dino_features=None,
    depth_features=None,
):
    """Device-side support/query split + query sampling (jit-able).

    Static output shapes: permutation indices are gathered, never boolean-
    masked, so the whole split stays on-chip inside the fused inference
    program. RNG contract: one ``jax.random`` key controls both the
    permutation and the per-query frame draw (documented replacement for the
    reference's np.random calls, inference.py:560-575).
    """
    k_perm, k_frames = jax.random.split(key)
    perm = jax.random.permutation(k_perm, tracks.shape[0])
    support_idx = perm[:num_support]
    query_idx = perm[num_support : num_support + num_queries]

    support_tracks = jnp.take(tracks, support_idx, axis=0)
    support_visible = jnp.take(visible, support_idx, axis=0)
    query_tracks = jnp.take(tracks, query_idx, axis=0)
    query_visible = jnp.take(visible, query_idx, axis=0)

    ts = jax.random.randint(k_frames, (num_queries,), 0, num_frames)
    ts_clipped = jnp.minimum(ts, tracks.shape[1] - 1)
    coords = jnp.take_along_axis(
        query_tracks, ts_clipped[:, None, None], axis=1
    )[:, 0, :]
    query_points = jnp.concatenate(
        [ts[:, None].astype(coords.dtype), coords], axis=1
    )

    out = {
        "support_tracks": support_tracks[jnp.newaxis],
        "support_tracks_visible": support_visible[jnp.newaxis],
        "query_points": query_points[jnp.newaxis],
        "query_tracks": query_tracks[jnp.newaxis],
        "query_tracks_visible": query_visible[jnp.newaxis],
        "boundary_frame": jnp.array([num_frames]),
    }
    if dino_features is not None:
        out["dino_features"] = jnp.take(dino_features, support_idx, axis=0)[
            jnp.newaxis
        ]
    if depth_features is not None:
        out["depth_features"] = jnp.take(depth_features, support_idx, axis=0)[
            jnp.newaxis
        ]
    return out
