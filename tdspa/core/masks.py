"""Attention-mask construction for ragged track sets.

Tracks are padded to static shapes (TPU-friendly); raggedness is expressed
through two signals that gate attention *keys*:

* ``boundary_frame`` — the first padding frame per batch element; keys at
  frames >= boundary are masked (reference track_autoencoder.py:217-229).
* per-frame visibility — invisible frames are masked as keys.

The 3D encoder prepends a learnable readout token whose key column is always
attendable. The reference's construction of that mask is shape-inconsistent
for T>1 (track_autoencoder_3d.py:167-180 concatenates a [*B,N,1,1] block onto
[*B,N,T,T] on the row axis); this module implements the intended semantics
in broadcast key-row form — [*B,N,1,T+1] with the readout key always on and
every (implicit) query row identical, equivalent to the reference's full
[T+1,T+1] product without the O(N*T^2) mask tensor.
"""

from __future__ import annotations

import jax.numpy as jnp


def visibility_key_mask(visible):  # float['*B N T 1'] -> bool['*B N T T']
    """Square per-track mask whose column k is the visibility of frame k."""
    vis = visible[..., 0].astype(bool)
    return jnp.ones_like(vis[..., jnp.newaxis]) * vis[..., jnp.newaxis, :]


def track_temporal_mask(visible, boundary_frame):
    """[*B N 1 T] key mask over each track's frame tokens.

    Key k attendable iff visible[k] and k < boundary_frame (2D encoder
    semantics, reference track_autoencoder.py:217-229). All query rows are
    identical, so the mask is materialized with a broadcast query axis of 1
    — semantics match the reference's full [T, T] product while avoiding an
    O(N*T^2) mask tensor in HBM.
    """
    vis = visible[..., 0].astype(bool)  # [*B N T]
    num_frames = visible.shape[-2]
    time = jnp.arange(num_frames)
    in_bounds = time < boundary_frame[..., jnp.newaxis, jnp.newaxis]  # [*B 1 T]
    return (vis & in_bounds)[..., jnp.newaxis, :]  # [*B N 1 T]


def readout_temporal_mask(visible, boundary_frame):
    """[*B N 1 T+1] key mask for [readout | frame tokens] self-attention.

    Key 0 (the readout token) is always attendable; key k+1 is attendable iff
    visible[k] and k < boundary_frame. All query rows are identical — the
    intended behavior of reference track_autoencoder_3d.py:167-180 (whose
    literal construction is shape-inconsistent for T>1).
    """
    num_frames = visible.shape[-2]
    vis = visible[..., 0].astype(bool)  # [*B N T]
    time = jnp.arange(num_frames)
    in_bounds = time < boundary_frame[..., jnp.newaxis, jnp.newaxis]  # [*B 1 T]
    key_ok = vis & in_bounds  # [*B N T]
    readout_col = jnp.ones_like(key_ok[..., :1])
    keys = jnp.concatenate([readout_col, key_ok], axis=-1)  # [*B N T+1]
    return keys[..., jnp.newaxis, :]  # [*B N 1 T+1]
