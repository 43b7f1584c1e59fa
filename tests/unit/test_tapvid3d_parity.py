"""tapnet `compute_tapvid3d_metrics` parity vectors.

tapnet is not importable here, so parity is pinned two ways (VERDICT r2 #5):

1. `_tapnet_transcription` below is a from-scratch NumPy transcription of
   tapnet's algorithm as specified by the TAPVid-3D benchmark (Koppula et
   al., 2024) and the reference's usage (evaluate_tapvid3d.py:100-109),
   written in tapnet's own code shape — batched arrays, one-hot query-frame
   exclusion, squared-distance strict comparison, geometric focal mean,
   boolean-union false positives — and deliberately NOT sharing code with
   `tdspa.eval.tapvid3d_metrics`. Randomized cross-checks diff the two.
2. Hand-computed vectors with analytically derived expected values that
   tapnet's implementation would also produce. Any deliberate divergence
   (empty-track scaling NaN, fixed-threshold table) is documented in
   tdspa/eval/tapvid3d_metrics.py's parity notes and exercised here.

If tapnet ever becomes importable, `compute_tapvid3d_metrics` delegates to
it directly and these same vectors re-validate the delegation.
"""

import numpy as np
import pytest

from tdspa.eval import compute_tapvid3d_metrics, zero_metrics

INTR = np.array([100.0, 100.0, 50.0, 50.0])  # geometric focal mean = 100


# ---------------------------------------------------------------------------
# Independent transcription of tapnet's algorithm (code shape mirrors
# tapnet/tapvid3d/evaluation/metrics.py, not tdspa's vendored version).
# ---------------------------------------------------------------------------

def _tapnet_transcription(
    gt_occluded, gt_tracks, pred_occluded, pred_tracks,
    intrinsics_params, scaling="median", query_points=None, order="n t",
):
    gt_occluded = np.asarray(gt_occluded, bool)
    gt_tracks = np.asarray(gt_tracks, np.float64)
    pred_occluded = np.asarray(pred_occluded, bool)
    pred_tracks = np.asarray(pred_tracks, np.float64)

    if order == "t n":
        gt_occluded = gt_occluded.T
        gt_tracks = np.transpose(gt_tracks, (1, 0, 2))
        pred_occluded = pred_occluded.T
        pred_tracks = np.transpose(pred_tracks, (1, 0, 2))

    # Add a batch axis like tapnet's [b, n, t] layout.
    gt_occluded = gt_occluded[None]
    gt_tracks = gt_tracks[None]
    pred_occluded = pred_occluded[None]
    pred_tracks = pred_tracks[None]

    visible = ~gt_occluded
    pred_visible = ~pred_occluded

    # Scaling: median of 3D norms over gt-visible points.
    if scaling == "median":
        gt_norms = np.linalg.norm(gt_tracks[visible], axis=-1)
        pred_norms = np.linalg.norm(pred_tracks[visible], axis=-1)
        with np.errstate(invalid="ignore"):
            pred_tracks = pred_tracks * (np.median(gt_norms) / np.median(pred_norms))
    elif scaling == "per_trajectory":
        scaled = np.array(pred_tracks)
        for n in range(gt_tracks.shape[1]):
            vis_n = visible[0, n]
            with np.errstate(invalid="ignore"):
                s = (
                    np.median(np.linalg.norm(gt_tracks[0, n][vis_n], axis=-1))
                    / np.median(np.linalg.norm(pred_tracks[0, n][vis_n], axis=-1))
                )
            scaled[0, n] = pred_tracks[0, n] * s
        pred_tracks = scaled
    elif scaling != "none":
        raise ValueError(scaling)

    # Query-frame exclusion via one-hot eye (tapnet's construction).
    num_frames = gt_tracks.shape[2]
    if query_points is not None:
        one_hot_eye = np.eye(num_frames)
        query_frame = np.round(np.asarray(query_points)[..., 0]).astype(np.int32)
        evaluation_points = (one_hot_eye[query_frame] == 0)[None]
    else:
        evaluation_points = np.ones(gt_occluded.shape, bool)

    out = {}
    out["occlusion_accuracy"] = np.sum(
        np.equal(pred_occluded, gt_occluded) & evaluation_points, axis=(1, 2)
    ) / np.sum(evaluation_points, axis=(1, 2))

    # Depth-adaptive thresholds: d px at depth z -> radius d * z / sqrt(fx*fy);
    # tapnet compares squared distances against the squared threshold.
    multiplier = gt_tracks[..., 2] / np.sqrt(
        intrinsics_params[0] * intrinsics_params[1]
    )
    dist_sq = np.sum(np.square(pred_tracks - gt_tracks), axis=-1)

    all_frac, all_jac = [], []
    for thresh in [1, 2, 4, 8, 16]:
        with np.errstate(invalid="ignore"):
            within_dist = dist_sq < np.square(thresh * multiplier)
        is_correct = np.logical_and(within_dist, visible)
        count_correct = np.sum(is_correct & evaluation_points, axis=(1, 2))
        count_visible_points = np.sum(visible & evaluation_points, axis=(1, 2))
        frac_correct = count_correct / count_visible_points
        out[f"pts_within_{thresh}"] = frac_correct

        true_positives = np.sum(
            is_correct & pred_visible & evaluation_points, axis=(1, 2)
        )
        gt_positives = np.sum(visible & evaluation_points, axis=(1, 2))
        false_positives = (~visible) & pred_visible
        false_positives = false_positives | ((~within_dist) & pred_visible)
        false_positives = np.sum(false_positives & evaluation_points, axis=(1, 2))
        jaccard = true_positives / (gt_positives + false_positives)
        out[f"jaccard_{thresh}"] = jaccard
        all_frac.append(frac_correct)
        all_jac.append(jaccard)
    out["average_jaccard"] = np.mean(all_jac, axis=0)
    out["average_pts_within_thresh"] = np.mean(all_frac, axis=0)
    return {k: float(np.squeeze(v)) for k, v in out.items()}


def _vendored(**kw):
    return compute_tapvid3d_metrics(**kw)


def _assert_same(a: dict, b: dict, atol=1e-12):
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=atol), k


# ---------------------------------------------------------------------------
# Randomized cross-checks: vendored == transcription on every metric.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scaling", ["none", "median", "per_trajectory"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_against_transcription(scaling, seed):
    rng = np.random.default_rng(seed)
    N, T = 7, 11
    gt = rng.normal(size=(N, T, 3)) * [2, 2, 1] + [0, 0, 12.0]
    pred = gt * rng.uniform(0.5, 2.0) + rng.normal(size=(N, T, 3)) * 0.3
    gt_occ = rng.random((N, T)) < 0.3
    pred_occ = rng.random((N, T)) < 0.3
    qp = np.stack(
        [rng.integers(0, T, N), rng.normal(size=N), rng.normal(size=N)], -1
    )
    kw = dict(
        gt_occluded=gt_occ, gt_tracks=gt, pred_occluded=pred_occ,
        pred_tracks=pred, intrinsics_params=INTR, scaling=scaling,
        query_points=qp, order="n t",
    )
    _assert_same(_vendored(**kw), _tapnet_transcription(**kw))


def test_randomized_tn_order_against_transcription():
    rng = np.random.default_rng(3)
    N, T = 5, 9
    gt = rng.normal(size=(T, N, 3)) + [0, 0, 9.0]
    pred = gt + rng.normal(size=(T, N, 3)) * 0.2
    gt_occ = rng.random((T, N)) < 0.25
    pred_occ = rng.random((T, N)) < 0.25
    kw = dict(
        gt_occluded=gt_occ, gt_tracks=gt, pred_occluded=pred_occ,
        pred_tracks=pred, intrinsics_params=INTR, scaling="median",
        order="t n",
    )
    _assert_same(_vendored(**kw), _tapnet_transcription(**kw))


# ---------------------------------------------------------------------------
# Hand-computed vectors (expected values derived analytically).
# ---------------------------------------------------------------------------

def test_vector_perfect_prediction():
    """V1: exact prediction, all visible -> every metric 1.0."""
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(4, 6, 3)) + [0, 0, 5.0]
    occ = np.zeros((4, 6), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=gt,
        intrinsics_params=INTR, scaling="none",
    )
    for k, v in m.items():
        assert v == 1.0, k


def test_vector_threshold_boundary_is_strict():
    """V2: error EXACTLY at the ball radius is NOT within (strict <)."""
    gt = np.array([[[0.0, 0.0, 100.0]]])  # N=1 T=1; 1px ball = 1.0 m
    occ = np.zeros((1, 1), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ,
        pred_tracks=gt + [1.0, 0.0, 0.0], intrinsics_params=INTR,
        scaling="none",
    )
    assert m["pts_within_1"] == 0.0  # 1.0 < 1.0 is False
    assert m["pts_within_2"] == 1.0
    # Jaccard at 1px: the single point is a mislocalization FP and an FN.
    assert m["jaccard_1"] == 0.0 and m["jaccard_2"] == 1.0


def test_vector_geometric_focal_mean():
    """V3: fx=64, fy=100 -> focal sqrt(6400)=80, not (64+100)/2=82.

    Depth 80 -> 1px ball = 1.0 m exactly. An error of 1.015 m is outside
    the geometric-mean ball (1.0) but inside the arithmetic-mean ball
    (82/80 = 1.025) — discriminates the two definitions.
    """
    intr = np.array([64.0, 100.0, 50.0, 50.0])
    gt = np.array([[[0.0, 0.0, 80.0]]])
    occ = np.zeros((1, 1), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ,
        pred_tracks=gt + [1.015, 0.0, 0.0], intrinsics_params=intr,
        scaling="none",
    )
    assert m["pts_within_1"] == 0.0
    assert m["pts_within_2"] == 1.0


def test_vector_query_frame_excluded():
    """V4: a wrong prediction at the query frame does not count."""
    T = 3
    gt = np.tile(np.array([0.0, 0.0, 10.0]), (1, T, 1))  # [N=1,T,3]
    occ = np.zeros((1, T), bool)
    pred = gt.copy()
    pred[0, 1] += 99.0  # grossly wrong ONLY at frame 1
    qp = np.array([[1.0, 0.0, 0.0]])  # query at frame 1 -> excluded
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=pred,
        intrinsics_params=INTR, scaling="none", query_points=qp,
    )
    for k, v in m.items():
        assert v == 1.0, k
    # Same inputs WITHOUT exclusion: 1 of 3 points is wrong.
    m2 = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=pred,
        intrinsics_params=INTR, scaling="none",
    )
    assert m2["pts_within_16"] == pytest.approx(2 / 3)


def test_vector_occlusion_accuracy_count():
    """V5: occlusion accuracy = plain flag agreement over eval points.

    N=2, T=4: track0 flags agree on all 4; track1 disagrees on 2 of 4
    -> 6/8 agreement.
    """
    gt = np.zeros((2, 4, 3)) + [0, 0, 5.0]
    gt_occ = np.array([[0, 0, 1, 1], [0, 1, 0, 1]], bool)
    pred_occ = np.array([[0, 0, 1, 1], [1, 1, 1, 1]], bool)
    m = _vendored(
        gt_occluded=gt_occ, gt_tracks=gt, pred_occluded=pred_occ,
        pred_tracks=gt, intrinsics_params=INTR, scaling="none",
    )
    assert m["occlusion_accuracy"] == pytest.approx(6 / 8)


def test_vector_jaccard_counts():
    """V6: hand-counted TP / FP(halluc) / FP(misloc) / FN at 1px.

    depth 100 -> 1px ball = 1.0 m. One track, 4 frames:
      f0: gt vis, pred vis, err 0      -> TP
      f1: gt vis, pred vis, err 5 m    -> FP (misloc) + FN
      f2: gt occ, pred vis, err 0      -> FP (hallucination)
      f3: gt vis, pred occ, err 0      -> FN (within but pred-occluded)
    TP=1, FP=2, FN=2 (gt_positives=3) -> jaccard = 1/(3+2) = 0.2.
    pts_within_1 counts visibility only: frames {f0, f3} of 3 visible -> 2/3.
    """
    gt = np.zeros((1, 4, 3)) + [0, 0, 100.0]
    pred = gt.copy()
    pred[0, 1, 0] += 5.0
    gt_occ = np.array([[0, 0, 1, 0]], bool)
    pred_occ = np.array([[0, 0, 0, 1]], bool)
    m = _vendored(
        gt_occluded=gt_occ, gt_tracks=gt, pred_occluded=pred_occ,
        pred_tracks=pred, intrinsics_params=INTR, scaling="none",
    )
    assert m["jaccard_1"] == pytest.approx(1 / 5)
    assert m["pts_within_1"] == pytest.approx(2 / 3)


def test_vector_median_scaling_exact_recovery():
    """V7: pred = s * gt -> median scaling recovers gt exactly."""
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(5, 6, 3)) + [0, 0, 7.0]
    occ = np.zeros((5, 6), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ,
        pred_tracks=gt * 0.137, intrinsics_params=INTR, scaling="median",
    )
    assert m["average_pts_within_thresh"] == 1.0
    assert m["average_jaccard"] == 1.0


def test_vector_median_scaling_is_global_not_per_track():
    """V8: two tracks with DIFFERENT true scales; global median scaling
    cannot fix both, per_trajectory can.

    Track A: gt depth 10, pred = 1x gt. Track B: gt depth 10, pred = 3x gt.
    Median-of-norms over all visible points: gt median 10, pred median 20
    (norms {10,10,30,30} -> 20) -> scale 0.5 -> A lands at 5 (5 m error,
    ball at 16px = 1.6 m -> outside), B at 15 (5 m error -> outside).
    per_trajectory scales A by 1.0 and B by 1/3 -> both exact.
    """
    gt = np.zeros((2, 2, 3))
    gt[..., 2] = 10.0
    pred = gt.copy()
    pred[1] *= 3.0
    occ = np.zeros((2, 2), bool)
    kw = dict(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=pred,
        intrinsics_params=INTR,
    )
    m_med = _vendored(scaling="median", **kw)
    assert m_med["pts_within_16"] == 0.0
    m_traj = _vendored(scaling="per_trajectory", **kw)
    assert m_traj["average_pts_within_thresh"] == 1.0


def test_vector_all_occluded_track_per_trajectory():
    """V9: a track with zero visible points under per_trajectory scaling.

    tapnet's empty-slice median yields NaN for that track's scale; its
    points then fail every within test — but the track contributes no
    visible point to any denominator, so the reported metrics equal the
    NaN-free scale=1.0 choice (documented divergence). Track0 perfect,
    track1 all-occluded with pred claiming visible on 2 of 3 frames:
      occlusion accuracy = (3 + 1) / 6
      pts_within_d = 3/3 (only track0's visible points count)
      jaccard_d = TP 3 / (gt_pos 3 + FP 2) = 3/5.
    """
    gt = np.zeros((2, 3, 3)) + [0, 0, 10.0]
    gt_occ = np.array([[0, 0, 0], [1, 1, 1]], bool)
    pred_occ = np.array([[0, 0, 0], [0, 0, 1]], bool)
    m = _vendored(
        gt_occluded=gt_occ, gt_tracks=gt, pred_occluded=pred_occ,
        pred_tracks=gt.copy(), intrinsics_params=INTR,
        scaling="per_trajectory",
    )
    assert m["occlusion_accuracy"] == pytest.approx(4 / 6)
    assert m["pts_within_4"] == 1.0
    assert m["jaccard_4"] == pytest.approx(3 / 5)
    assert np.isfinite(list(m.values())).all()


def test_vector_negative_depth_uses_abs():
    """V10: tapnet squares the signed threshold -> |z| ball; a point at
    z=-100 with 0.5 m error is within 1px (ball 1.0 m)."""
    gt = np.array([[[0.0, 0.0, -100.0]]])
    occ = np.zeros((1, 1), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ,
        pred_tracks=gt + [0.5, 0, 0], intrinsics_params=INTR, scaling="none",
    )
    assert m["pts_within_1"] == 1.0
    t = _tapnet_transcription(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ,
        pred_tracks=gt + [0.5, 0, 0], intrinsics_params=INTR, scaling="none",
    )
    assert t["pts_within_1"] == 1.0


def test_vector_averages_are_threshold_means():
    """V11: average_* equal the arithmetic mean over the 5 thresholds."""
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(6, 8, 3)) + [0, 0, 10.0]
    pred = gt + rng.normal(size=(6, 8, 3)) * 0.4
    occ = np.zeros((6, 8), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=pred,
        intrinsics_params=INTR, scaling="none",
    )
    assert m["average_jaccard"] == pytest.approx(
        np.mean([m[f"jaccard_{d}"] for d in (1, 2, 4, 8, 16)])
    )
    assert m["average_pts_within_thresh"] == pytest.approx(
        np.mean([m[f"pts_within_{d}"] for d in (1, 2, 4, 8, 16)])
    )


def test_vector_single_frame_query_exclusion_degenerates():
    """V12: T=1 with the query at frame 0 leaves no eval points ->
    the reference's zero-metrics dict (its exception fallback,
    evaluate_tapvid3d.py:378-395)."""
    gt = np.zeros((2, 1, 3)) + [0, 0, 5.0]
    occ = np.zeros((2, 1), bool)
    qp = np.zeros((2, 3))
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=gt,
        intrinsics_params=INTR, scaling="none", query_points=qp,
    )
    assert m == zero_metrics()


def test_vector_scaling_none_left_untouched():
    """V13: scaling='none' evaluates raw predictions: pred = 2x gt at
    depth 10 -> 10 m radial error, outside even 16px (1.6 m)."""
    gt = np.zeros((1, 2, 3)) + [0, 0, 10.0]
    occ = np.zeros((1, 2), bool)
    m = _vendored(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ,
        pred_tracks=gt * 2.0, intrinsics_params=INTR, scaling="none",
    )
    assert m["pts_within_16"] == 0.0
