"""Unit tests: boundary/visibility attention-mask semantics."""

import jax.numpy as jnp
import numpy as np

from tdspa.core.masks import (
    readout_temporal_mask,
    track_temporal_mask,
    visibility_key_mask,
)


def test_track_temporal_mask_semantics():
    # 1 batch, 1 track, 4 frames; frame 2 invisible, boundary at 3.
    visible = jnp.array([[[1.0, 1.0, 0.0, 1.0]]])[..., None]  # [1,1,4,1]
    boundary = jnp.array([3])
    mask = track_temporal_mask(visible, boundary)
    # Broadcast query-row form: key k attendable iff visible[k] and k < 3.
    assert mask.shape == (1, 1, 1, 4)
    np.testing.assert_array_equal(
        np.asarray(mask[0, 0, 0]).astype(bool), [True, True, False, False]
    )


def test_readout_temporal_mask_semantics():
    visible = jnp.array([[[1.0, 0.0, 1.0]]])[..., None]  # [1,1,3,1]
    boundary = jnp.array([2])
    mask = readout_temporal_mask(visible, boundary)
    assert mask.shape == (1, 1, 1, 4)  # T+1 keys, broadcast query row
    # Key 0 = readout (always on); keys 1..3 = frames (vis & in-bounds).
    np.testing.assert_array_equal(
        np.asarray(mask[0, 0, 0]).astype(bool), [True, True, False, False]
    )


def test_visibility_key_mask_is_column_broadcast():
    visible = jnp.array([[[1.0, 0.0]]])[..., None]
    m = np.asarray(visibility_key_mask(visible)[0, 0])
    np.testing.assert_array_equal(m, [[True, False], [True, False]])


def test_batch_boundary_broadcast():
    visible = jnp.ones((2, 3, 5, 1))
    boundary = jnp.array([5, 2])
    mask = np.asarray(track_temporal_mask(visible, boundary)).astype(bool)
    assert mask.shape == (2, 3, 1, 5)
    assert mask[0].all()
    np.testing.assert_array_equal(
        mask[1, 0, 0], [True, True, False, False, False]
    )


def test_key_row_mask_equivalent_to_full_product():
    """The slim [.., 1, K] mask must equal the reference's full [T, T]
    product (partition * visibility) broadcast over query rows."""
    import jax

    visible = (jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 6, 1)) > 0.4
               ).astype(jnp.float32)
    boundary = jnp.array([6, 3])
    slim = np.asarray(track_temporal_mask(visible, boundary)).astype(bool)

    # Reference construction (track_autoencoder.py:217-229).
    time = jnp.arange(6)
    partition = time < boundary[..., None, None, None]
    vis = visible[..., 0].astype(bool)
    full = np.asarray(
        (jnp.ones_like(vis[..., None]) * vis[..., None, :]) * partition
    ).astype(bool)
    np.testing.assert_array_equal(np.broadcast_to(slim, full.shape), full)
