"""Eval harness end-to-end on synthetic ground truth with a tiny model."""

import jax
import numpy as np

from tdspa.eval.harness import (
    build_eval_batch,
    evaluate_model,
    evaluate_video,
    pad_example_to_bucket,
)
from tdspa.utils.testing import tiny_model_3d

T = 12


def _gt_example(n=10, t=T, seed=0):
    rng = np.random.default_rng(seed)
    tracks = rng.normal(size=(n, t, 3)).astype(np.float32) + [0, 0, 5.0]
    visible = (rng.uniform(size=(n, t, 1)) > 0.2).astype(np.float32)
    qf = rng.integers(0, t, size=n)
    queries_xyt = np.stack(
        [rng.uniform(0, 64, n), rng.uniform(0, 64, n), qf.astype(np.float64)],
        axis=1,
    ).astype(np.float32)
    return {
        "tracks_3d": tracks,
        "visible": visible,
        "queries_xyt": queries_xyt,
        "intrinsics": np.array([100.0, 100.0, 32.0, 32.0], np.float32),
    }


def test_pad_example_to_bucket():
    ex = _gt_example(n=10, t=7)
    tracks_p, visible_p, queries_p, t_used = pad_example_to_bucket(
        ex["tracks_3d"], ex["visible"], np.zeros((10, 4), np.float32), T, 8
    )
    assert tracks_p.shape == (16, T, 3)
    assert visible_p.shape == (16, T, 1)
    assert queries_p.shape == (16, 4)
    assert t_used == 7
    assert (visible_p[10:] == 0).all()  # padded tracks invisible
    assert (visible_p[:10, 7:] == 0).all()  # padded frames invisible


def test_build_eval_batch_query_points():
    ex = _gt_example()
    batch, meta = build_eval_batch(ex, num_output_frames=T, track_bucket=8)
    assert batch["support_tracks"].shape == (1, 16, T, 3)
    qp = np.asarray(batch["query_points"][0])
    # (t, x, y, z): coords are the gt track at the query frame.
    for i in range(meta["num_tracks"]):
        t = int(qp[i, 0])
        np.testing.assert_allclose(qp[i, 1:], ex["tracks_3d"][i, t], atol=1e-6)
    assert int(batch["boundary_frame"][0]) == T


def test_evaluate_video_and_model():
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    ex = _gt_example()
    batch, _ = build_eval_batch(ex, num_output_frames=T, track_bucket=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    metrics = evaluate_video(
        variables["params"],
        ex,
        num_output_frames=T,
        depth_scalings=("median", "per_trajectory"),
        track_bucket=8,
        model=model,
    )
    assert set(metrics.keys()) == {"median", "per_trajectory"}
    for scaling in metrics:
        assert 0.0 <= metrics[scaling]["occlusion_accuracy"] <= 1.0
        assert "average_jaccard" in metrics[scaling]

    agg = evaluate_model(
        variables["params"],
        [_gt_example(seed=i) for i in range(3)],
        num_output_frames=T,
        depth_scalings=("median",),
        track_bucket=8,
        model=model,
    )
    assert "average_jaccard" in agg["median"]
    assert "average_jaccard_std" in agg["median"]


def test_oracle_predictions_score_perfect():
    """Feed ground truth as 'predictions' through the metric path."""
    from tdspa.eval import compute_tapvid3d_metrics

    ex = _gt_example()
    gt_tracks = np.transpose(ex["tracks_3d"], (1, 0, 2))
    gt_occ = np.transpose(~ex["visible"][..., 0].astype(bool), (1, 0))
    m = compute_tapvid3d_metrics(
        gt_occ, gt_tracks, gt_occ, gt_tracks,
        ex["intrinsics"], scaling="median",
        query_points=ex["queries_xyt"][:, ::-1], order="t n",
    )
    assert m["occlusion_accuracy"] == 1.0
    assert m["average_jaccard"] == 1.0


def test_batched_evaluate_model_matches_per_video():
    """Batch-8 stacked forwards == per-video forwards (same metrics), incl.
    mixed bucket shapes and a partial final group."""
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    # 5 videos of one bucket (n=10 -> 16) + 2 of another (n=20 -> 24).
    examples = [_gt_example(seed=i) for i in range(5)] + [
        _gt_example(n=20, seed=10 + i) for i in range(2)
    ]
    batch, _ = build_eval_batch(examples[0], num_output_frames=T, track_bucket=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = variables["params"]

    per_video = [
        evaluate_video(params, ex, num_output_frames=T,
                       depth_scalings=("median",), track_bucket=8, model=model)
        for ex in examples
    ]
    expected = {}
    for key in per_video[0]["median"]:
        vals = [v["median"][key] for v in per_video]
        expected[key] = float(np.mean(vals))

    agg = evaluate_model(
        params, examples, num_output_frames=T, depth_scalings=("median",),
        track_bucket=8, batch_size=4, model=model,
    )
    for key, val in expected.items():
        # Batched compilation changes float reduction order; the random-init
        # tiny model has logits near 0, so a handful of occlusion flips are
        # legitimate — metrics must still agree closely.
        np.testing.assert_allclose(agg["median"][key], val, atol=0.02,
                                   err_msg=key)
