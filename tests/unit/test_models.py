"""Unit tests: model forward contracts, quirk preservation, decode paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdspa.models.trajan2d import (
    append_time_feature,
    default_query_grid,
    quantize_latents,
)
from tdspa.utils.testing import synthetic_batch, tiny_model_2d, tiny_model_3d

T = 12


@pytest.fixture(scope="module")
def setup_2d():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, num_coords=2, num_frames=T)
    model = tiny_model_2d(T)
    variables = jax.jit(model.init)(rng, batch)
    return model, variables, batch


@pytest.fixture(scope="module")
def setup_3d():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, num_coords=3, num_frames=T, with_features=True)
    model = tiny_model_3d(T)
    variables = jax.jit(model.init)(rng, batch)
    return model, variables, batch


def test_2d_forward_shapes(setup_2d):
    model, variables, batch = setup_2d
    out = jax.jit(model.apply)(variables, batch)
    B, Q = batch["query_points"].shape[:2]
    assert out.tracks.shape == (B, Q, T, 2)
    assert out.visible_logits.shape == (B, Q, T, 1)
    assert out.certain_logits.shape == (B, Q, T, 1)
    assert bool(jnp.isfinite(out.tracks).all())


def test_3d_forward_shapes_and_zero_certainty(setup_3d):
    model, variables, batch = setup_3d
    out = jax.jit(model.apply)(variables, batch)
    B, Q = batch["query_points"].shape[:2]
    assert out.tracks.shape == (B, Q, T, 3)
    assert out.visible_logits.shape == (B, Q, T, 1)
    # 3DSPA defines certainty = zeros (reference track_autoencoder_3d.py:301).
    assert bool((out.certain_logits == 0).all())


def test_results_properties(setup_3d):
    model, variables, batch = setup_3d
    out = model.apply(variables, batch)
    vis = np.asarray(out.visible)
    assert set(np.unique(vis)).issubset({0.0, 1.0})
    # 3D: certain == sigmoid(0) = 0.5 -> visible_and_certain never true.
    assert not np.asarray(out.visible_and_certain).any()


def test_chunked_decode_matches_dense(setup_3d):
    model, variables, batch = setup_3d
    dense = jax.jit(model.apply)(variables, batch)
    chunked_model = tiny_model_3d(T, decoder_scan_chunk_size=2)
    chunked = jax.jit(chunked_model.apply)(variables, batch)
    np.testing.assert_allclose(
        np.asarray(dense.tracks), np.asarray(chunked.tracks), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dense.visible_logits),
        np.asarray(chunked.visible_logits),
        atol=1e-5,
    )


def test_chunked_encode_matches_dense(setup_3d):
    """encoder_scan_chunk_size: chunked == unchunked (per-track encode is
    independent across tracks), params identical, and gradients flow."""
    model, variables, batch = setup_3d
    dense = jax.jit(model.apply)(variables, batch)
    n = batch["support_tracks"].shape[1]
    assert n % 2 == 0
    chunked_model = tiny_model_3d(T, encoder_scan_chunk_size=n // 2)
    chunked = jax.jit(chunked_model.apply)(variables, batch)
    np.testing.assert_allclose(
        np.asarray(dense.tracks), np.asarray(chunked.tracks), atol=1e-5
    )

    def loss(v):
        return jnp.sum(chunked_model.apply(v, batch).tracks ** 2)

    grads = jax.grad(loss)(variables)
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads)
    )


def test_chunked_encode_rejects_indivisible(setup_3d):
    model, variables, batch = setup_3d
    n = batch["support_tracks"].shape[1]
    bad = tiny_model_3d(T, encoder_scan_chunk_size=n + 1)
    with pytest.raises(ValueError, match="must divide"):
        bad.apply(variables, batch)


def test_default_query_grid_path(setup_2d):
    model, variables, batch = setup_2d
    no_queries = {k: v for k, v in batch.items() if k != "query_points"}
    out = jax.jit(model.apply)(variables, no_queries)
    assert out.tracks.shape == (batch["support_tracks"].shape[0], 1024, T, 2)


def test_default_query_grid_values():
    grid = default_query_grid((2,), num_coords=3, grid_size=4)
    assert grid.shape == (2, 16, 3)
    g = np.asarray(grid[0])
    # Half-pixel centers; x varies fastest; z zeros.
    assert g[0, 0] == pytest.approx(1 / 8)
    assert g[1, 0] == pytest.approx(1 / 8 + 1 / 4)
    assert (g[:, 2] == 0).all()


def test_encode_decode_separately_callable(setup_3d):
    model, variables, batch = setup_3d
    latents = model.apply(variables, batch, method=model.encode)
    assert latents.shape == (
        batch["support_tracks"].shape[0],
        model.num_latent_tokens,
        model.latent_token_dim,
    )
    ctx = model.apply(variables, batch, method=model.get_decoder_context)
    out = model.apply(variables, latents, ctx, method=model.decode)
    full = model.apply(variables, batch)
    np.testing.assert_allclose(
        np.asarray(out.tracks), np.asarray(full.tracks), atol=1e-5
    )


def test_append_time_feature_matches_eye_matmul():
    # Oracle: the reference's einsum with a shifted eye
    # (track_autoencoder.py:275-289).
    key = jax.random.PRNGKey(0)
    B, Q, N, C = 2, 3, 4, 40
    latents = jax.random.normal(key, (B, Q, N, C))
    query_frame = jnp.array([[0, 2, 7], [1, 3, 5]])

    def get_eye(idx):
        return jnp.eye(128, C, idx * 5)

    eye_fn = jax.vmap(jax.vmap(get_eye))
    multiplier = eye_fn(query_frame)
    expected_append = jnp.einsum("...NC,...DC->...ND", latents, multiplier)
    expected = jnp.concatenate([latents, expected_append], axis=-1)

    got = append_time_feature(latents, query_frame)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_append_time_feature_out_of_range_zero_fill():
    latents = jnp.ones((1, 1, 2, 130))
    query_frame = jnp.array([[1]])  # offset 5: channels 5..132 -> 3 out of range
    out = append_time_feature(latents, query_frame)
    appendix = np.asarray(out[0, 0, 0, 130:])
    np.testing.assert_array_equal(appendix[:125], 1.0)
    np.testing.assert_array_equal(appendix[125:], 0.0)


def test_quantize_latents_grid_and_ste():
    x = jnp.array([[0.511, -0.249, 1.7, -3.0]])
    q = quantize_latents(x)
    # Clipped to [-1, 1], rounded to 1/128 grid, dither in [-1/256, 1/256).
    clipped = jnp.clip(x, -1, 1)
    grid = jnp.round(clipped * 128) / 128
    assert bool((jnp.abs(q - grid) <= 1 / 256 + 1e-6).all())
    # Deterministic: fixed PRNGKey(0) dither.
    np.testing.assert_array_equal(np.asarray(q), np.asarray(quantize_latents(x)))
    # Straight-through gradient: identity inside the clip range.
    g = jax.grad(lambda v: quantize_latents(v).sum())(jnp.array([0.3, -0.9]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


def test_dead_time_term_preserved(setup_2d):
    """query_frame // 150.0 must floor to 0 for t < 150 (reference quirk Q3)."""
    model, variables, batch = setup_2d
    qp = batch["query_points"]
    # Two different frames < 150 with identical spatial coords must give
    # identical query tokens => identical outputs when latents fixed.
    qp_a = qp.at[..., 0].set(3.0)
    qp_b = qp.at[..., 0].set(7.0)
    out_a = model.apply(variables, {**batch, "query_points": qp_a})
    out_b = model.apply(variables, {**batch, "query_points": qp_b})
    # Time conditioning flows ONLY through append_time_feat; with a tiny
    # latent dim the appendix gather differs, so check the query-token path
    # via the decoder context instead.
    ctx_a = model.apply(
        variables, {**batch, "query_points": qp_a}, method=model.get_decoder_context
    )
    ctx_b = model.apply(
        variables, {**batch, "query_points": qp_b}, method=model.get_decoder_context
    )
    np.testing.assert_allclose(
        np.asarray(ctx_a.decoder_query), np.asarray(ctx_b.decoder_query)
    )
    assert int(ctx_a.query_frame[0, 0]) == 3
    assert int(ctx_b.query_frame[0, 0]) == 7
    # And outputs do differ (time feature appendix is alive).
    assert not np.allclose(np.asarray(out_a.tracks), np.asarray(out_b.tracks))


def test_3d_without_features(setup_3d):
    _, variables, batch = setup_3d
    model_nf = tiny_model_3d(T, use_dino=False, use_depth=False)
    rng = jax.random.PRNGKey(0)
    slim_batch = {
        k: v
        for k, v in batch.items()
        if k not in ("dino_features", "depth_features")
    }
    v_nf = jax.jit(model_nf.init)(rng, slim_batch)
    assert "dino_projection" not in v_nf["params"]
    assert "depth_projection" not in v_nf["params"]
    out = model_nf.apply(v_nf, slim_batch)
    assert bool(jnp.isfinite(out.tracks).all())
