"""Data layer: batch prep semantics, providers, prefetch."""

import numpy as np
import jax
import jax.numpy as jnp

from tdspa.data import (
    NpzDirectoryProvider,
    SyntheticTrackProvider,
    device_prefetch,
    prepare_2d_batch,
    prepare_3d_batch,
)
from tdspa.data.batch_prep import split_and_sample_queries
from tdspa.data.providers import BatchedTrackDataset


def _example_3d(n=16, t=8):
    rng = np.random.default_rng(0)
    return {
        "tracks_3d": rng.normal(size=(n, t, 3)).astype(np.float32),
        "visible": (rng.uniform(size=(n, t, 1)) > 0.3).astype(np.float32),
        "dino_features": rng.normal(size=(n, t, 768)).astype(np.float32),
        "depth_features": rng.normal(size=(n, t, 256)).astype(np.float32),
    }


def test_prepare_3d_batch_contract():
    ex = _example_3d()
    batch = prepare_3d_batch(
        ex, num_support_tracks=6, num_query_tracks=5, num_frames=8, seed=0
    )
    assert batch["support_tracks"].shape == (1, 6, 8, 3)
    assert batch["query_tracks"].shape == (1, 5, 8, 3)
    assert batch["query_points"].shape == (1, 5, 4)
    assert batch["dino_features"].shape == (1, 6, 8, 768)
    assert int(batch["boundary_frame"][0]) == 8
    # Query point == query track position at its sampled frame.
    qp = np.asarray(batch["query_points"][0])
    qt = np.asarray(batch["query_tracks"][0])
    for i in range(5):
        t = int(qp[i, 0])
        np.testing.assert_allclose(qp[i, 1:], qt[i, min(t, 7)], atol=1e-6)
    # Support and query sets are disjoint track selections.
    flat_support = np.asarray(batch["support_tracks"][0]).reshape(6, -1)
    flat_query = np.asarray(batch["query_tracks"][0]).reshape(5, -1)
    for q in flat_query:
        assert not (flat_support == q).all(axis=1).any()


def test_prepare_2d_batch_contract():
    rng = np.random.default_rng(1)
    ex = {
        "tracks": rng.normal(size=(10, 6, 2)).astype(np.float32),
        "visible": np.ones((10, 6, 1), np.float32),
    }
    batch = prepare_2d_batch(
        ex, num_support_tracks=4, num_query_tracks=4, num_frames=6, seed=1
    )
    assert batch["support_tracks"].shape == (1, 4, 6, 2)
    assert batch["query_points"].shape == (1, 4, 3)


def test_split_and_sample_queries_device_side():
    ex = _example_3d()
    out = jax.jit(
        split_and_sample_queries, static_argnums=(3, 4, 5)
    )(
        jax.random.PRNGKey(0),
        jnp.asarray(ex["tracks_3d"]),
        jnp.asarray(ex["visible"]),
        6,
        5,
        8,
    )
    assert out["support_tracks"].shape == (1, 6, 8, 3)
    assert out["query_points"].shape == (1, 5, 4)
    qp = np.asarray(out["query_points"][0])
    qt = np.asarray(out["query_tracks"][0])
    for i in range(5):
        np.testing.assert_allclose(qp[i, 1:], qt[i, min(int(qp[i, 0]), 7)], atol=1e-6)


def test_synthetic_provider_deterministic():
    p = SyntheticTrackProvider(num_videos=3, num_tracks=8, num_frames=5)
    a, b = p[1], p[1]
    np.testing.assert_array_equal(a["tracks_3d"], b["tracks_3d"])
    assert len(list(iter(p))) == 3


def test_npz_directory_provider(tmp_path):
    ex = _example_3d(n=8, t=4)
    np.savez(tmp_path / "vid0.npz", **ex)
    np.savez(
        tmp_path / "vid1_gt.npz",
        tracks_XYZ=ex["tracks_3d"],
        visibility=ex["visible"][..., 0],
        queries_xyt=np.ones((8, 3), np.float32),
        fx_fy_cx_cy=np.array([100.0, 100.0, 50.0, 50.0], np.float32),
    )
    provider = NpzDirectoryProvider(str(tmp_path))
    assert len(provider) == 2
    train_ex = provider[0]
    assert train_ex["tracks_3d"].shape == (8, 4, 3)
    gt_ex = provider[1]
    assert gt_ex["visible"].shape == (8, 4, 1)
    assert "intrinsics" in gt_ex and "queries_xyt" in gt_ex


def test_batched_dataset_and_prefetch():
    provider = SyntheticTrackProvider(num_videos=4, num_tracks=12, num_frames=5)

    def prepare(example, seed=None):
        return prepare_3d_batch(
            example, num_support_tracks=4, num_query_tracks=4, num_frames=5,
            use_dino=False, use_depth=False, seed=seed,
        )

    ds = BatchedTrackDataset(provider, batch_size=2, prepare_fn=prepare)
    assert len(ds) == 2
    batches = list(device_prefetch(iter(ds)))
    assert len(batches) == 2
    assert batches[0]["support_tracks"].shape == (2, 4, 5, 3)
    assert isinstance(batches[0]["support_tracks"], jax.Array)
    # take() limits
    assert len(list(ds.take(1))) == 1


def test_tfds_provider_with_fake_tfds(monkeypatch):
    """TfdsTrackProvider reads a tfds data_source and normalizes kubric-style
    fields (target_points/occluded) into the provider schema; the loader
    entry points route builder names through it (reference
    data_loader.py:136 intent)."""
    import sys
    import types

    import numpy as np

    from tdspa.data.providers import (
        TfdsTrackProvider,
        load_kubric3d_dataset,
        load_tapvid3d_dataset,
    )

    raw_2d = {
        "target_points": np.zeros((6, 5, 2), np.float32),
        "occluded": np.zeros((6, 5), np.float32),
        "video": np.zeros((5, 8, 8, 3), np.uint8),
    }
    raw_3d = {
        "tracks_XYZ": np.ones((6, 5, 3), np.float32),
        "visibility": np.ones((6, 5), np.float32),
        "fx_fy_cx_cy": np.array([100.0, 100.0, 4.0, 4.0], np.float32),
        "queries_xyt": np.zeros((6, 3), np.float32),
    }

    fake = types.ModuleType("tensorflow_datasets")
    fake.data_source = lambda name, split=None, data_dir=None: (
        [raw_2d] * 3 if name == "tapvid" else [raw_3d] * 3
    )
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", fake)

    p = TfdsTrackProvider("tapvid", split="train")
    assert len(p) == 3
    ex = p[0]
    assert ex["tracks"].shape == (6, 5, 2)
    assert ex["visible"].shape == (6, 5, 1)
    assert (ex["visible"] == 1.0).all()  # occluded=0 -> visible=1

    p3 = TfdsTrackProvider("kubric3d", split="train")
    ex3 = p3[0]
    assert ex3["tracks_3d"].shape == (6, 5, 3)
    assert "fx_fy_cx_cy" in ex3 and "queries_xyt" in ex3

    # Name-based resolution through the public loaders.
    ds = load_kubric3d_dataset("kubric3d", batch_size=3, num_frames=5,
                               num_support_tracks=3, num_query_tracks=3,
                               use_dino=False, use_depth=False)
    batch = next(iter(ds))
    assert batch["support_tracks"].shape[0] == 3  # batch dim

    eval_ds = load_tapvid3d_dataset("tapvid3d")
    assert len(eval_ds) == 3
    assert eval_ds[0]["tracks_3d"].shape == (6, 5, 3)


def test_tfds_provider_streaming_fallback(monkeypatch):
    """Builders without data_source support fall back to tfds.load."""
    import sys
    import types

    import numpy as np

    from tdspa.data.providers import TfdsTrackProvider

    raw = {"tracks": np.zeros((2, 4, 2), np.float32)}

    def no_source(*a, **k):
        raise RuntimeError("no ArrayRecord for this builder")

    fake = types.ModuleType("tensorflow_datasets")
    fake.data_source = no_source
    fake.load = lambda name, split=None, data_dir=None: "DS"
    fake.as_numpy = lambda ds: iter([raw, raw])
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", fake)

    p = TfdsTrackProvider("whatever")
    assert len(p) == 2
    # No visibility field at all -> all-visible default.
    assert (p[1]["visible"] == 1.0).all()
