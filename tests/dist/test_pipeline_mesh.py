"""The mesh-wired inference tail: sharded == single-device on the 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdspa.infer.pipeline import fused_tail, make_mesh_tail
from tdspa.parallel import make_mesh
from tdspa.utils.testing import tiny_model_3d

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

T, H, W = 10, 32, 32
N_TRACKS, N_SUPPORT, N_QUERIES = 64, 32, 16


def _front_end(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    tracks_2d = jax.random.uniform(
        k1, (N_TRACKS, T, 2), minval=0.0, maxval=W - 1.0
    )
    visible = (
        jax.random.uniform(k2, (N_TRACKS, T, 1)) > 0.2
    ).astype(jnp.float32)
    dino_grid = jax.random.normal(k3, (T, 4, 4, 8))
    depth_maps = jax.random.uniform(k4, (T, H, W, 1), minval=0.5, maxval=4.0)
    return tracks_2d, visible, dino_grid, depth_maps


@requires_8
def test_mesh_tail_matches_single_device():
    rng = jax.random.PRNGKey(0)
    tracks_2d, visible, dino_grid, depth_maps = _front_end(rng)
    model = tiny_model_3d(T, use_dino=True, use_depth=True, dino_feature_dim=8)
    key = jax.random.PRNGKey(7)

    # Single-device reference through the standard fused tail.
    ref_pred, ref_batch, ref_tracks3d = _run_single(
        model, tracks_2d, visible, dino_grid, depth_maps, key
    )

    mesh = make_mesh(seq=2)
    tail = make_mesh_tail(
        mesh, model, N_SUPPORT, N_QUERIES, (H, W), True, True
    )
    params = _init_params(model, tracks_2d, visible, dino_grid, depth_maps, key)
    got_pred, got_batch, got_tracks3d = tail(
        params, tracks_2d, visible, dino_grid, depth_maps, key
    )

    np.testing.assert_allclose(
        np.asarray(got_tracks3d), np.asarray(ref_tracks3d), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_batch["support_tracks"]),
        np.asarray(ref_batch["support_tracks"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_pred.tracks), np.asarray(ref_pred.tracks), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_pred.visible_logits),
        np.asarray(ref_pred.visible_logits),
        atol=2e-4,
    )


def _init_params(model, tracks_2d, visible, dino_grid, depth_maps, key):
    from tdspa.data.batch_prep import split_and_sample_queries
    from tdspa.ops.geometry import (
        lift_2d_to_3d,
        sample_depth_features_for_tracks,
        sample_dino_features_for_tracks,
    )

    tracks_3d = lift_2d_to_3d(tracks_2d, depth_maps)
    dino_feats = sample_dino_features_for_tracks(
        dino_grid, tracks_2d, (T, H, W, 3)
    )
    depth_feats = sample_depth_features_for_tracks(depth_maps, tracks_2d)
    batch = split_and_sample_queries(
        key, tracks_3d, visible, N_SUPPORT, N_QUERIES, T,
        dino_features=dino_feats, depth_features=depth_feats,
    )
    return jax.jit(model.init)(jax.random.PRNGKey(42), batch)["params"]


def _run_single(model, tracks_2d, visible, dino_grid, depth_maps, key):
    params = _init_params(model, tracks_2d, visible, dino_grid, depth_maps, key)
    return fused_tail(
        params, tracks_2d, visible, dino_grid, depth_maps, key,
        model, N_SUPPORT, N_QUERIES, (H, W), True, True,
    )


@requires_8
def test_sharded_train_step_no_retrace():
    """The hoisted pjit retraces once per (shape, keyset), not per step."""
    from tdspa.train import create_model_state, make_train_step
    from tdspa.parallel.shardings import shard_batch
    from tdspa.utils.testing import TINY_3D, synthetic_batch

    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=8, num_support=8, num_queries=8,
                            num_frames=T)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", warmup_steps=1, total_steps=10,
        num_output_frames=T, use_dino=False, use_depth=False, **TINY_3D,
    )
    mesh = make_mesh(seq=2)
    step = make_train_step(model, tx, sched, mesh=mesh, donate=False)
    sharded = shard_batch(mesh, batch)
    # Pre-place the state replicated (as the train loop does): otherwise the
    # first call's uncommitted arrays and later calls' NamedSharding outputs
    # key two separate pjit cache entries.
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    for _ in range(3):
        state, _ = step(state, sharded)
    assert step.cache_size() == 1, (
        f"expected exactly one trace, got {step.cache_size()}"
    )


@requires_8
def test_fused_kernel_spmd_batch_sharded():
    """custom_partitioning on the Pallas kernel: a batch-sharded call equals
    the replicated call and KEEPS the batch sharding on its output (i.e. the
    partitioner runs the kernel per shard instead of replicating around it).
    Interpret mode stands in for Mosaic on the CPU mesh; the real-chip
    compile check lives in the bench/verify flow."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdspa.kernels.attention import fused_masked_attention

    rng = jax.random.PRNGKey(0)
    b, s, kv, h, d = 16, 8, 24, 2, 8
    q = jax.random.normal(rng, (b, s, h, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, kv, h, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, kv, h, d))
    mask = (
        jax.random.uniform(jax.random.fold_in(rng, 3), (b, kv)) > 0.3
    ).astype(jnp.float32)

    expected = fused_masked_attention(q, k, v, mask, interpret=True)

    mesh = make_mesh(seq=2)  # 4x2: batch shards over both axes jointly
    sh = NamedSharding(mesh, P(("data", "seq")))
    args = [jax.device_put(x, sh) for x in (q, k, v, mask)]
    got = jax.jit(
        lambda *a: fused_masked_attention(*a, interpret=True)
    )(*args)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
    assert got.sharding.spec[0] == ("data", "seq"), got.sharding


@requires_8
def test_mesh_tail_matches_single_device_fused(monkeypatch):
    """VERDICT r2 #3: the mesh decode path keeps the Pallas kernels. The
    fused model under the 4x2 mesh must equal the fused single-device tail
    (both in interpret mode on the CPU mesh)."""
    import tdspa.kernels.attention as ka

    monkeypatch.setattr(ka, "INTERPRET_DEFAULT", True)

    rng = jax.random.PRNGKey(0)
    tracks_2d, visible, dino_grid, depth_maps = _front_end(rng)
    model = tiny_model_3d(
        T, use_dino=True, use_depth=True, dino_feature_dim=8,
        fused_attention=True,
    )
    key = jax.random.PRNGKey(7)

    ref_pred, _, _ = _run_single(
        model, tracks_2d, visible, dino_grid, depth_maps, key
    )

    mesh = make_mesh(seq=2)
    tail = make_mesh_tail(mesh, model, N_SUPPORT, N_QUERIES, (H, W), True, True)
    params = _init_params(model, tracks_2d, visible, dino_grid, depth_maps, key)
    got_pred, _, _ = tail(params, tracks_2d, visible, dino_grid, depth_maps, key)

    np.testing.assert_allclose(
        np.asarray(got_pred.tracks), np.asarray(ref_pred.tracks), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_pred.visible_logits),
        np.asarray(ref_pred.visible_logits),
        atol=2e-4,
    )


@requires_8
def test_mesh_tail_serving_config(monkeypatch):
    """The full TPU serving config — fused attention + fused int8
    projections + bf16 residual stream — composes under the mesh (every
    kernel is custom_partitioning-wrapped) and stays within the combined
    error bound of the two rewrites (int8 < 2%, bf16 residual < 1%)."""
    import tdspa.kernels.attention as ka
    import tdspa.kernels.quant_matmul as kq

    monkeypatch.setattr(ka, "INTERPRET_DEFAULT", True)
    monkeypatch.setattr(kq, "INTERPRET_DEFAULT", True)

    rng = jax.random.PRNGKey(0)
    tracks_2d, visible, dino_grid, depth_maps = _front_end(rng)
    ref_model = tiny_model_3d(
        T, use_dino=True, use_depth=True, dino_feature_dim=8
    )
    serving = tiny_model_3d(
        T, use_dino=True, use_depth=True, dino_feature_dim=8,
        fused_attention=True, quantize=True, residual_dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(7)

    ref_pred, _, _ = _run_single(
        ref_model, tracks_2d, visible, dino_grid, depth_maps, key
    )

    mesh = make_mesh(seq=2)
    tail = make_mesh_tail(mesh, serving, N_SUPPORT, N_QUERIES, (H, W), True, True)
    # Same param tree: the serving rewrites must load the same checkpoint.
    params = _init_params(
        ref_model, tracks_2d, visible, dino_grid, depth_maps, key
    )
    got_pred, _, _ = tail(params, tracks_2d, visible, dino_grid, depth_maps, key)

    ref_t = np.asarray(ref_pred.tracks)
    got_t = np.asarray(got_pred.tracks, dtype=np.float32)
    scale = np.abs(ref_t).max()
    assert np.abs(ref_t - got_t).max() / scale < 0.03, (
        np.abs(ref_t - got_t).max() / scale
    )
    ref_v = np.asarray(ref_pred.visible_logits)
    got_v = np.asarray(got_pred.visible_logits, dtype=np.float32)
    assert np.abs(ref_v - got_v).max() / np.abs(ref_v).max() < 0.05


@requires_8
def test_mesh_tail_aot_export_roundtrip(tmp_path):
    """Multi-chip AOT artifact (export_mesh_tail): serialize -> deserialize
    -> call on a live same-size mesh == the live mesh tail exactly."""
    from tdspa.infer.export import (
        call_exported_mesh,
        export_mesh_tail,
        load_exported_mesh,
    )

    rng = jax.random.PRNGKey(0)
    tracks_2d, visible, dino_grid, depth_maps = _front_end(rng)
    model = tiny_model_3d(T, use_dino=True, use_depth=True, dino_feature_dim=8)
    key = jax.random.PRNGKey(7)
    params = _init_params(model, tracks_2d, visible, dino_grid, depth_maps, key)

    mesh = make_mesh(seq=2)
    live = make_mesh_tail(mesh, model, N_SUPPORT, N_QUERIES, (H, W), True, True)(
        params, tracks_2d, visible, dino_grid, depth_maps, key
    )

    exported = export_mesh_tail(
        mesh, model, N_SUPPORT, N_QUERIES, (H, W), True, True,
        params=params, tracks_2d_shape=(N_TRACKS, T),
        dino_grid_shape=(T, 4, 4, 8), depth_maps_shape=(T, H, W, 1),
    )
    assert exported.nr_devices == 8
    path = str(tmp_path / "mesh_tail.shlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())

    back = load_exported_mesh(path)
    out_pred, out_batch, out_tracks3d = call_exported_mesh(
        back, mesh, params, tracks_2d, visible, dino_grid, depth_maps, key
    )
    np.testing.assert_array_equal(
        np.asarray(out_pred.tracks), np.asarray(live[0].tracks)
    )
    np.testing.assert_array_equal(
        np.asarray(out_pred.visible_logits), np.asarray(live[0].visible_logits)
    )
    np.testing.assert_array_equal(
        np.asarray(out_batch["query_tracks"]),
        np.asarray(live[1]["query_tracks"]),
    )
    np.testing.assert_array_equal(
        np.asarray(out_tracks3d), np.asarray(live[2])
    )
