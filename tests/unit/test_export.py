"""AOT serving export (tdspa/infer/export.py): roundtrip parity + manifest.

The exported artifact must reproduce the live fused-tail program exactly
(same trace, same constants) after a serialize -> deserialize roundtrip,
and must lower for a TPU target from this CPU-only test process.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdspa.data.batch_prep import split_and_sample_queries
from tdspa.infer.export import (
    export_serving_tail,
    load_exported,
    make_serving_fn,
    read_manifest,
    save_exported,
)
from tdspa.ops.geometry import (
    lift_2d_to_3d,
    sample_depth_features_for_tracks,
    sample_dino_features_for_tracks,
)
from tdspa.utils.testing import tiny_model_3d

T, H, W = 8, 32, 32
N_TRACKS, N_SUPPORT, N_QUERIES = 16, 8, 4
DINO_HW, DINO_DIM = (4, 4), 8


def _inputs(seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    tracks_2d = jax.random.uniform(
        keys[0], (N_TRACKS, T, 2), minval=0.0, maxval=W - 1.0
    )
    visible = (jax.random.uniform(keys[1], (N_TRACKS, T, 1)) > 0.2).astype(
        jnp.float32
    )
    dino_grid = jax.random.normal(keys[2], (T,) + DINO_HW + (DINO_DIM,))
    depth_maps = jax.random.uniform(
        keys[3], (T, H, W, 1), minval=0.5, maxval=4.0
    )
    return tracks_2d, visible, dino_grid, depth_maps


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model_3d(T, use_dino=True, use_depth=True, dino_feature_dim=DINO_DIM)
    tracks_2d, visible, dino_grid, depth_maps = _inputs()
    tracks_3d = lift_2d_to_3d(tracks_2d, depth_maps)
    batch = split_and_sample_queries(
        jax.random.PRNGKey(7), tracks_3d, visible, N_SUPPORT, N_QUERIES, T,
        dino_features=sample_dino_features_for_tracks(
            dino_grid, tracks_2d, (T, H, W, 3)
        ),
        depth_features=sample_depth_features_for_tracks(depth_maps, tracks_2d),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(3), batch)["params"]
    return model, params


def _export(model, params, **kw):
    return export_serving_tail(
        model, params,
        num_tracks=N_TRACKS, num_frames=T, video_hw=(H, W),
        num_support=N_SUPPORT, num_queries=N_QUERIES,
        use_dino=True, use_depth=True,
        dino_grid_hw=DINO_HW, dino_dim=DINO_DIM, **kw,
    )


def test_roundtrip_matches_live_program(model_and_params, tmp_path):
    model, params = model_and_params
    tracks_2d, visible, dino_grid, depth_maps = _inputs(seed=1)
    seed = jnp.uint32(5)

    live = make_serving_fn(model, N_SUPPORT, N_QUERIES, (H, W), True, True)(
        params, seed, tracks_2d, visible, dino_grid, depth_maps
    )

    exported = _export(model, params)
    path = str(tmp_path / "tail.shlo")
    manifest = save_exported(exported, path, {"model": "tiny_3d"})
    out = load_exported(path).call(
        params, seed, tracks_2d, visible, dino_grid, depth_maps
    )

    assert set(out) == {
        "tracks", "visible_logits", "certain_logits", "query_points",
        "tracks_3d", "support_tracks", "query_tracks",
    }
    assert out["tracks"].shape == (1, N_QUERIES, T, 3)
    for k in live:
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), np.asarray(live[k], np.float32),
            rtol=1e-6, atol=1e-6, err_msg=k,
        )
    # The split is seed-deterministic through the artifact too.
    out2 = load_exported(path).call(
        params, jnp.uint32(6), tracks_2d, visible, dino_grid, depth_maps
    )
    assert not np.allclose(
        np.asarray(out2["query_points"]), np.asarray(out["query_points"])
    )

    disk = read_manifest(path)
    assert disk == manifest
    assert disk["model"] == "tiny_3d"
    assert disk["nr_args"] == len(exported.in_avals)
    assert disk["jax_version"] == jax.__version__


def test_feature_args_dropped_when_disabled(tmp_path):
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    tracks_2d, visible, _, _ = _inputs()
    tracks_3d = jnp.concatenate(
        [tracks_2d, jnp.ones(tracks_2d.shape[:-1] + (1,))], axis=-1
    )
    batch = split_and_sample_queries(
        jax.random.PRNGKey(7), tracks_3d, visible, N_SUPPORT, N_QUERIES, T
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(3), batch)["params"]
    exported = export_serving_tail(
        model, params,
        num_tracks=N_TRACKS, num_frames=T, video_hw=(H, W),
        num_support=N_SUPPORT, num_queries=N_QUERIES,
        use_dino=False, use_depth=False,
    )
    path = str(tmp_path / "tail_min.shlo")
    save_exported(exported, path)
    out = load_exported(path).call(params, jnp.uint32(0), tracks_2d, visible)
    assert out["tracks"].shape == (1, N_QUERIES, T, 3)
    assert bool(jnp.all(jnp.isfinite(out["tracks"])))


def test_model_forward_export_trajan2d(tmp_path):
    """Bare-forward export covers the 2D family too (roundtrip parity)."""
    from tdspa.infer.export import export_model_forward
    from tdspa.utils.testing import synthetic_batch, tiny_model_2d

    model = tiny_model_2d(T)
    batch = synthetic_batch(
        jax.random.PRNGKey(0), batch=2, num_support=8, num_queries=4,
        num_frames=T, num_coords=2,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch)["params"]
    live = model.apply({"params": params}, batch)

    exported = export_model_forward(model, params, batch)
    path = str(tmp_path / "fwd2d.shlo")
    save_exported(exported, path)
    out = load_exported(path).call(params, dict(batch))
    np.testing.assert_allclose(
        np.asarray(out["tracks"]), np.asarray(live.tracks),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["visible_logits"]), np.asarray(live.visible_logits),
        rtol=1e-6, atol=1e-6,
    )


def test_load_path_needs_no_model_modules():
    """A serving binary imports export.py for load_exported() only — that
    must not drag in the pipeline/model stack (flax tracing deps)."""
    import subprocess
    import sys as _sys

    code = (
        "import sys, tdspa.infer.export; "
        "bad = [m for m in sys.modules if 'pipeline' in m or 'models' in m "
        "or m == 'flax']; "
        "assert not bad, bad"
    )
    res = subprocess.run(
        [_sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
        env={**__import__('os').environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_lowers_for_tpu_from_cpu_host(model_and_params):
    """Cross-platform lowering: a CPU-only build host can emit the TPU
    artifact (the deployment story docs/SERVING.md describes)."""
    model, params = model_and_params
    exported = _export(model, params, platforms=("tpu",))
    assert exported.platforms == ("tpu",)
    data = exported.serialize()
    assert len(data) > 0
