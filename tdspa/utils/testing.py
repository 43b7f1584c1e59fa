"""Tiny-model factories and synthetic batch builders for tests/benchmarks.

Synthetic tracks are analytic (sinusoidal orbits with deterministic
visibility), so integration tests can verify train/infer behavior without any
external datasets or checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdspa.models import TrackAutoEncoder, TrackAutoEncoder3D

TINY_2D = dict(
    num_latent_tokens=8,
    latent_token_dim=8,
    num_frequencies=4,
    track_token_dim=16,
    encoder_latent_dim=16,
    decoder_num_channels=160,  # must be > 128 (time-feature appendix)
    qkv_size=16,
    num_heads=2,
    input_track_layers=1,
    input_track_mlp=32,
    tracks_to_latents_layers=1,
    tracks_to_latents_mlp=32,
    decompress_layers=1,
    decompress_mlp=32,
    readout_layers=1,
    readout_mlp=32,
)

TINY_3D = dict(TINY_2D)


def tiny_model_2d(num_output_frames: int = 12, **overrides) -> TrackAutoEncoder:
    return TrackAutoEncoder(
        num_output_frames=num_output_frames, **{**TINY_2D, **overrides}
    )


def tiny_model_3d(num_output_frames: int = 12, **overrides) -> TrackAutoEncoder3D:
    return TrackAutoEncoder3D(
        num_output_frames=num_output_frames, **{**TINY_3D, **overrides}
    )


def synthetic_tracks(key, batch, num_tracks, num_frames, num_coords=3):
    """Smooth analytic tracks: per-track sinusoidal orbits in [0, 1]^C."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    center = jax.random.uniform(k1, (batch, num_tracks, 1, num_coords))
    radius = jax.random.uniform(k2, (batch, num_tracks, 1, num_coords)) * 0.1
    phase = jax.random.uniform(k3, (batch, num_tracks, 1, num_coords)) * 2 * jnp.pi
    freq = jax.random.uniform(k4, (batch, num_tracks, 1, num_coords)) * 4 + 1
    t = jnp.arange(num_frames)[None, None, :, None] / num_frames
    return center + radius * jnp.sin(2 * jnp.pi * freq * t + phase)


def synthetic_batch(
    key,
    batch: int = 2,
    num_support: int = 8,
    num_queries: int = 4,
    num_frames: int = 12,
    num_coords: int = 3,
    with_features: bool = False,
    dino_dim: int = 768,
    depth_dim: int = 256,
):
    """Build a full train/eval batch of synthetic tracks.

    Query points are taken from the query tracks at a random frame, in
    (t, *coords) layout matching the model contract.
    """
    ks = jax.random.split(key, 6)
    support = synthetic_tracks(ks[0], batch, num_support, num_frames, num_coords)
    query = synthetic_tracks(ks[1], batch, num_queries, num_frames, num_coords)
    support_vis = (
        jax.random.uniform(ks[2], (batch, num_support, num_frames, 1)) > 0.2
    ).astype(jnp.float32)
    query_vis = (
        jax.random.uniform(ks[3], (batch, num_queries, num_frames, 1)) > 0.2
    ).astype(jnp.float32)
    qt = jax.random.randint(ks[4], (batch, num_queries), 0, num_frames)
    coords_at_t = jnp.take_along_axis(
        query, qt[..., None, None], axis=-2
    )[..., 0, :]
    query_points = jnp.concatenate(
        [qt[..., None].astype(jnp.float32), coords_at_t], axis=-1
    )
    out = {
        "support_tracks": support,
        "support_tracks_visible": support_vis,
        "query_points": query_points,
        "query_tracks": query,
        "query_tracks_visible": query_vis,
        "boundary_frame": jnp.full((batch,), num_frames, jnp.int32),
    }
    if with_features:
        out["dino_features"] = (
            jax.random.normal(ks[5], (batch, num_support, num_frames, dino_dim)) * 0.1
        )
        out["depth_features"] = (
            jax.random.normal(ks[5], (batch, num_support, num_frames, depth_dim)) * 0.1
        )
    return out
