"""TAPVid-3D metric math on hand-computed cases."""

import numpy as np

from tdspa.eval import compute_tapvid3d_metrics, zero_metrics
from tdspa.eval.tapvid3d_metrics import PIXEL_THRESHOLDS

INTR = np.array([100.0, 100.0, 50.0, 50.0])  # focal = 100


def test_zero_metrics_keys_match_reference():
    keys = set(zero_metrics().keys())
    expected = {"occlusion_accuracy", "average_jaccard", "average_pts_within_thresh"}
    for d in (1, 2, 4, 8, 16):
        expected |= {f"pts_within_{d}", f"jaccard_{d}"}
    assert keys == expected


def test_perfect_prediction():
    T, N = 5, 3
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(T, N, 3)) + [0, 0, 5.0]
    occ = np.zeros((T, N), bool)
    m = compute_tapvid3d_metrics(
        gt_occluded=occ, gt_tracks=gt, pred_occluded=occ, pred_tracks=gt,
        intrinsics_params=INTR, scaling="none", order="t n",
    )
    assert m["occlusion_accuracy"] == 1.0
    assert m["average_jaccard"] == 1.0
    assert m["average_pts_within_thresh"] == 1.0


def test_depth_adaptive_threshold():
    # One track, one frame, depth 100 -> 1px threshold = 1*100/100 = 1.0m.
    gt = np.array([[[0.0, 0.0, 100.0]]])  # [T=1, N=1, 3]
    occ = np.zeros((1, 1), bool)
    # Error of 0.5m: inside the 1px ball at this depth.
    pred_close = gt + [0.5, 0, 0]
    m = compute_tapvid3d_metrics(occ, gt, occ, pred_close, INTR, scaling="none",
                                 order="t n")
    assert m["pts_within_1"] == 1.0
    # Error of 1.5m: outside 1px (1.0m) but inside 2px (2.0m).
    pred_far = gt + [1.5, 0, 0]
    m = compute_tapvid3d_metrics(occ, gt, occ, pred_far, INTR, scaling="none",
                                 order="t n")
    assert m["pts_within_1"] == 0.0 and m["pts_within_2"] == 1.0
    # Same pixel error at 10x less depth -> 10x smaller ball.
    gt_near = gt / 10
    m = compute_tapvid3d_metrics(occ, gt_near, occ, gt_near + [0.5, 0, 0], INTR,
                                 scaling="none", order="t n")
    assert m["pts_within_1"] == 0.0 and m["pts_within_8"] == 1.0


def test_median_scaling_recovers_scaled_predictions():
    T, N = 4, 6
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(T, N, 3)) + [0, 0, 8.0]
    occ = np.zeros((T, N), bool)
    pred = gt * 3.7  # prediction correct up to a global scale
    m = compute_tapvid3d_metrics(occ, gt, occ, pred, INTR, scaling="median",
                                 order="t n")
    assert m["average_pts_within_thresh"] == 1.0
    m_none = compute_tapvid3d_metrics(occ, gt, occ, pred, INTR, scaling="none",
                                      order="t n")
    assert m_none["average_pts_within_thresh"] < 1.0


def test_per_trajectory_scaling():
    T, N = 3, 2
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(T, N, 3)) + [0, 0, 8.0]
    occ = np.zeros((T, N), bool)
    pred = gt.copy()
    pred[:, 0] *= 2.0  # different scale per track
    pred[:, 1] *= 0.5
    m_traj = compute_tapvid3d_metrics(occ, gt, occ, pred, INTR,
                                      scaling="per_trajectory", order="t n")
    m_med = compute_tapvid3d_metrics(occ, gt, occ, pred, INTR,
                                     scaling="median", order="t n")
    assert m_traj["average_pts_within_thresh"] == 1.0
    assert m_med["average_pts_within_thresh"] < 1.0


def test_occlusion_accuracy_and_jaccard_counts():
    # 1 frame, 4 tracks, hand-computed confusion:
    # t0: gt vis, pred vis, within      -> TP
    # t1: gt vis, pred vis, NOT within  -> FP(misloc) + FN
    # t2: gt occ, pred vis              -> FP(halluc)
    # t3: gt vis, pred occ, within      -> FN
    gt = np.zeros((1, 4, 3))
    gt[..., 2] = 100.0  # 1px ball = 1.0m
    pred = gt.copy()
    pred[0, 1, 0] = 5.0  # mislocated
    gt_occ = np.array([[False, False, True, False]])
    pred_occ = np.array([[False, False, False, True]])
    m = compute_tapvid3d_metrics(gt_occ, gt, pred_occ, pred, INTR,
                                 scaling="none", order="t n")
    # occlusion flags agree on t0, t1 only -> 2/4
    assert m["occlusion_accuracy"] == 0.5
    # pts_within over gt-visible (t0,t1,t3): t0 within, t1 not, t3 within -> 2/3
    np.testing.assert_allclose(m["pts_within_1"], 2 / 3)
    # jaccard: TP=1 (t0), FP=2 (t1 misloc + t2 halluc), FN=2 (t1, t3) -> 1/5
    np.testing.assert_allclose(m["jaccard_1"], 1 / 5)


def test_query_frame_excluded():
    T, N = 3, 2
    gt = np.zeros((T, N, 3))
    gt[..., 2] = 100.0
    occ = np.zeros((T, N), bool)
    pred = gt.copy()
    pred[1, :, 0] = 99.0  # wildly wrong ONLY at frame 1
    # query frame 1 for both tracks (layout (t, y, x): column 0 is t)
    qp = np.array([[1, 0, 0], [1, 0, 0]], np.float64)
    m = compute_tapvid3d_metrics(occ, gt, occ, pred, INTR, scaling="none",
                                 query_points=qp, order="t n")
    assert m["average_pts_within_thresh"] == 1.0  # bad frame excluded
    m_no_qp = compute_tapvid3d_metrics(occ, gt, occ, pred, INTR, scaling="none",
                                       order="t n")
    assert m_no_qp["average_pts_within_thresh"] < 1.0


def test_order_nt_equivalent():
    T, N = 4, 3
    rng = np.random.default_rng(3)
    gt = rng.normal(size=(T, N, 3)) + [0, 0, 5.0]
    pred = gt + rng.normal(size=gt.shape) * 0.05
    occ = rng.uniform(size=(T, N)) > 0.7
    pocc = rng.uniform(size=(T, N)) > 0.7
    m_tn = compute_tapvid3d_metrics(occ, gt, pocc, pred, INTR, scaling="none",
                                    order="t n")
    m_nt = compute_tapvid3d_metrics(
        occ.T, np.transpose(gt, (1, 0, 2)), pocc.T,
        np.transpose(pred, (1, 0, 2)), INTR, scaling="none", order="n t",
    )
    for k in m_tn:
        np.testing.assert_allclose(m_tn[k], m_nt[k], err_msg=k)
