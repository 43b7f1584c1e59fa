"""Realism scorer + visualization npz round trip."""

import jax
import numpy as np

from tdspa.eval.realism import save_visualization_npz, score_tracks
from tdspa.utils.testing import synthetic_batch, tiny_model_3d
from tdspa.viz.paint import load_visualization_data

T = 10


def test_score_tracks_contract():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=1, num_queries=5, num_frames=T)
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    variables = jax.jit(model.init)(rng, batch)
    out = score_tracks(model, variables["params"], batch)
    assert out["coords_score"].shape == (T, 5)
    assert out["point_error"].shape == (5, T)
    assert 0.0 <= out["realism_score"] <= 1.0
    assert 0.0 <= out["visible_agreement"] <= 1.0
    assert (out["coords_score"] > 0).all() and (out["coords_score"] <= 1).all()


def test_perfect_reconstruction_scores_one():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=1, num_queries=4, num_frames=T)
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    variables = jax.jit(model.init)(rng, batch)
    # Make the target equal the model's own predictions -> zero error.
    preds = jax.jit(model.apply)(variables, batch)
    batch = dict(batch)
    batch["query_tracks"] = preds.tracks
    out = score_tracks(model, variables["params"], batch)
    assert out["mean_error"] < 1e-5
    assert out["realism_score"] > 0.999


def test_save_visualization_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    T_, N, H, W = 4, 6, 16, 16
    path = str(tmp_path / "viz.npz")
    save_visualization_npz(
        path,
        coords=rng.normal(size=(T_, N, 3)),
        coords_score=rng.uniform(size=(T_, N)),
        video=rng.integers(0, 255, (T_, H, W, 3)).astype(np.uint8),
        visibs=np.ones((T_, N)),
    )
    data = load_visualization_data(path)
    assert data["coords"].shape == (T_, N, 3)
    assert data["video"].shape == (T_, 3, H, W)
    assert data["intrinsics"].shape == (T_, 3, 3)  # tiled from [3 3]
    assert data["visibs"].dtype == bool
