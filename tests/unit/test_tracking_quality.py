"""Quantitative tracking quality vs synthetic ground truth.

The reference's front-end quality contract is CoTracker3
(inference.py:97-154); the TPU-native LK tracker must be measurably good at
the same job: localize points and classify occlusion. Scenes from
``make_tracking_scene`` give exact ground truth (textured sprites sweeping
over a textured background), so both position error and occlusion detection
are scored with hard thresholds, and the appearance-NCC occlusion reasoning
must demonstrably beat plain FB-checked LK.
"""

import numpy as np
import pytest

from tdspa.eval.tracking_quality import tracking_quality
from tdspa.features.tracks import PyramidalLKTracker, make_query_grid
from tdspa.utils.synthetic_video import make_tracking_scene

SEEDS = (0, 1, 2)


def _scene_and_tracker(seed, **tracker_kwargs):
    video, gt_tracks, gt_vis = make_tracking_scene(seed=seed)
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", **tracker_kwargs)
    return video, gt_tracks, gt_vis, tracker


@pytest.mark.parametrize("seed", SEEDS)
def test_lk_position_quality(seed):
    video, gt_tracks, gt_vis, tracker = _scene_and_tracker(seed)
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    # Localization: most gt-visible points within 2px; claimed-visible
    # points sub-pixel on average (round-3 bar: center-weighted NCC marks
    # drifting points occluded, so both-visible EPE tightened 0.75 -> 0.3).
    assert q["pts_within_2"] > 0.9, q
    assert q["epe_both_visible"] < 0.3, q
    assert q["visible_recall"] > 0.9, q


@pytest.mark.parametrize("seed", SEEDS)
def test_lk_occlusion_detection(seed):
    video, gt_tracks, gt_vis, tracker = _scene_and_tracker(seed)
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    # Round-3 bar (VERDICT r2 #2): >= 0.8 on every seed (was 0.5; the
    # round-2 spread was 0.56-0.93). Center-weighted NCC + raised
    # thresholds get 0.956/0.836/0.851 (docs/BENCHMARKS.md round 3).
    assert q["occlusion_recall"] > 0.8, q
    assert q["visibility_accuracy"] > 0.9, q


def test_appearance_ncc_beats_plain_fb_lk():
    """The occlusion-reasoning pass must measurably improve on FB-only LK."""
    gains = []
    for seed in SEEDS:
        video, gt_tracks, gt_vis, with_ncc = _scene_and_tracker(seed)
        _, _, _, fb_only = _scene_and_tracker(
            seed, ncc_threshold=-1.0, template_ncc_threshold=-1.0
        )
        q_ncc = tracking_quality(with_ncc(video), gt_tracks, gt_vis)
        q_fb = tracking_quality(fb_only(video), gt_tracks, gt_vis)
        gains.append(q_ncc["occlusion_recall"] - q_fb["occlusion_recall"])
        # The position metrics must not regress.
        assert q_ncc["pts_within_2"] >= q_fb["pts_within_2"] - 1e-6
    assert float(np.mean(gains)) > 0.25, gains


@pytest.mark.parametrize("seed", SEEDS)
def test_fast_config_quality(seed):
    """The pipeline's fast config (NCC checks, no backward pass) must hold
    the same quality bars as the full config — it halves tracking cost."""
    video, gt_tracks, gt_vis, tracker = _scene_and_tracker(
        seed, fb_threshold=-1.0
    )
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    assert q["pts_within_2"] > 0.9, q
    assert q["occlusion_recall"] > 0.8, q
    assert q["visible_recall"] > 0.9, q
    assert q["visibility_accuracy"] > 0.9, q


def test_fast_motion_rescue():
    """Fast camera pan (8 px/frame, past plain LK's pull-in range): the
    constant-velocity prior + coarse-level cost-volume rescue must recover
    most background points, and must not regress the static case.

    Measured (XLA oracle, seed 0, 24 frames): survival@4px at the last
    frame 0.25 plain -> 0.80 with corr_radius=4 + corr_rescue_level=2;
    static-scene EPE 0.141 -> 0.027."""
    video, gt_tracks, gt_vis = make_tracking_scene(
        num_frames=24, height=256, width=256, grid_size=8, seed=0, pan=(8, 0)
    )
    queries = gt_tracks[:, 0]

    def survival(kwargs):
        from tdspa.ops.lk import track_video_lk

        tracks, _ = track_video_lk(video, queries, **kwargs)
        err = np.linalg.norm(np.asarray(tracks) - gt_tracks, axis=-1)
        last = gt_vis[:, -1]
        return float((err[last, -1] < 4).mean())

    plain = survival({})
    rescued = survival(dict(corr_radius=4, corr_rescue_level=2))
    assert rescued > 0.7, (plain, rescued)
    assert rescued > plain + 0.3, (plain, rescued)


def test_ground_truth_self_consistency():
    """A perfect oracle scores perfectly (sanity check of the metric math)."""
    _, gt_tracks, gt_vis = make_tracking_scene(seed=0)
    q = tracking_quality(
        {"tracks": gt_tracks, "visible": gt_vis.astype(np.float32)},
        gt_tracks, gt_vis,
    )
    assert q["epe_gt_visible"] == 0.0
    assert q["visibility_accuracy"] == 1.0
    assert q["occlusion_recall"] == 1.0
    assert q["visible_recall"] == 1.0


def test_pallas_kernel_quality_matches_xla(monkeypatch):
    """The Pallas path (interpret mode) scores comparably on a small scene."""
    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=0, num_frames=10, height=160, width=256, grid_size=8
    )
    from tdspa.kernels.lk import track_video_lk_pallas

    queries = make_query_grid(160, 256, 8)
    tracks, vis = track_video_lk_pallas(
        video, queries, interpret=True
    )
    q = tracking_quality(
        {"tracks": np.asarray(tracks), "visible": np.asarray(vis)},
        gt_tracks, gt_vis,
    )
    assert q["pts_within_2"] > 0.85, q
    assert q["visibility_accuracy"] > 0.85, q


def test_deforming_scene_ground_truth_consistency():
    """Non-rigid mode: GT must satisfy the warp's defining equation
    (x - D(x, t) = rigid composite position) and frame 0 must be
    undeformed. Guards the fixed-point inversion in make_tracking_scene."""
    rigid = make_tracking_scene(seed=5, num_sprites=0, num_frames=16)
    deform = make_tracking_scene(
        seed=5, num_sprites=0, num_frames=16, deform_amp=5.0
    )
    # Frame 0 identical (D(., 0) = 0): same queries, same first frame.
    np.testing.assert_array_equal(deform[1][:, 0], rigid[1][:, 0])
    np.testing.assert_array_equal(deform[0][0], rigid[0][0])
    # The warp actually moves content (several px) yet stays smooth.
    disp = np.linalg.norm(deform[1] - rigid[1], axis=-1)
    assert disp.max() > 3.0
    assert disp.max() < 12.0  # amp 5 * (1 + 0.5) components bound
    # A perfect oracle still scores perfectly on the deformed GT.
    q = tracking_quality(
        {"tracks": deform[1], "visible": deform[2].astype(np.float32)},
        deform[1], deform[2],
    )
    assert q["visibility_accuracy"] == 1.0


def test_zoom_scene_ground_truth_is_exact_affine():
    """zoom_rate renders x -> c + s_t (x - c) exactly (the affine folds
    into the warp fixed-point machinery); measured tracker robustness to
    2%/frame zoom is recorded in docs/BENCHMARKS.md."""
    v, tr, vis = make_tracking_scene(
        seed=1, num_sprites=0, zoom_rate=0.02, num_frames=16,
    )
    c = np.array([128.0, 80.0])  # frame center (W=256, H=160)
    s_last = 1 + 0.02 * 15
    expect = c + (tr[:, 0] - c) * s_last
    assert np.abs(tr[:, -1] - expect).max() < 1e-3


def test_rotation_scene_ground_truth_is_exact_affine():
    """rot_rate renders x -> c + R(theta_t)(x - c) exactly."""
    v, tr, vis = make_tracking_scene(
        seed=1, num_sprites=0, rot_rate=np.deg2rad(1.0), num_frames=16,
    )
    c = np.array([128.0, 80.0])
    th = np.deg2rad(15.0)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    expect = c + (tr[:, 0] - c) @ R.T
    assert np.abs(tr[:, -1] - expect).max() < 1e-3


def test_strong_rotation_ground_truth_is_exact_affine():
    """The rot_strong operating point (2.5 deg/frame, 24 frames -> 57.5
    deg cumulative). The plain fixed-point GT solve's contraction factor
    for roll is 2 sin(theta/2) ~ 0.96 here: 12 rounds left ~45 px median
    GT error on late frames (GT inconsistent with the rendered video —
    measured round 4). The exact-affine-preconditioned solve must be
    exact at ANY angle the renderer supports."""
    v, tr, vis = make_tracking_scene(
        seed=310, num_sprites=0, rot_rate=np.deg2rad(2.5), num_frames=24,
    )
    c = np.array([128.0, 80.0])
    for f in (8, 16, 20, 23):
        th = np.deg2rad(2.5) * f
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        expect = c + (tr[:, 0] - c) @ R.T
        assert np.abs(tr[:, f] - expect).max() < 1e-3, f


def test_zoom_roll_combined_ground_truth_is_exact_affine():
    """Zoom and roll together: the combined affine map
    x -> c + s_t R(theta_t)(x - c)... is NOT what the additive
    displacement fields compose to — the renderer adds D_zoom + D_rot,
    giving backward map x - D = c + ((1/s)I + R(-th) - I)(x - c); the GT
    must invert exactly THAT map (match what the renderer does, not an
    idealized composition)."""
    zr, rr = 0.01, np.deg2rad(2.0)
    v, tr, vis = make_tracking_scene(
        seed=2, num_sprites=0, zoom_rate=zr, rot_rate=rr, num_frames=20,
    )
    c = np.array([128.0, 80.0])
    for f in (5, 12, 19):
        s_t = 1.0 + zr * f
        th = rr * f
        rot_back = np.array(
            [[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]]
        )
        m = (1.0 / s_t) * np.eye(2) + rot_back - np.eye(2)
        # forward map = inverse of the backward map
        expect = c + (tr[:, 0] - c) @ np.linalg.inv(m).T
        assert np.abs(tr[:, f] - expect).max() < 1e-3, f


@pytest.mark.parametrize(
    "kw",
    [dict(zoom_rate=0.02), dict(rot_rate=0.0174533)],  # 2%/frame; 1 deg/frame
    ids=["zoom", "roll"],
)
def test_classical_lk_robust_to_slow_affine_motion(kw):
    """Measured round 3 (docs/BENCHMARKS.md): chain-tracked incremental LK
    absorbs slow zoom/roll without any learned machinery. Locks that
    robustness: a regression here means the velocity prior / chaining
    broke, not that a matcher is needed."""
    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=0, noise_sigma=10.0, contrast=0.7, **kw
    )
    tracker = PyramidalLKTracker(grid_size=12, device="cpu")
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    assert q["pts_within_2"] > 0.8, q
    assert q["visibility_accuracy"] > 0.8, q


def test_strong_roll_stabilized_retrack():
    """Strong camera roll (2.5 deg/frame, 57.5 deg cumulative): rotated
    templates defeat both the LK window match and the matcher's
    axis-aligned cost patches (measured round 4: 0.49 classical, 0.53
    matcher). The auto policy must detect the roll from the classical
    pass's own tracks, counter-warp to frame-0 orientation
    (tdspa/ops/warp.py), re-track there, and map positions back —
    measured 0.975 pts-within-2."""
    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=310, num_sprites=0, rot_rate=np.deg2rad(2.5), num_frames=24
    )
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    assert q["pts_within_2"] > 0.9, q
    assert q["visibility_accuracy"] > 0.9, q


def test_stabilize_gate_stays_off_without_strong_roll(monkeypatch):
    """The escalation is for heavy roll ONLY: translation-like, slow-roll,
    zoom, and deforming content must not trigger the re-track (the
    existing rescue/matcher stack already handles those, and a spurious
    warp pass costs a full second re-track). Measured gate inputs per
    regime are recorded at tracks.py STAB_MIN_* definitions."""
    engaged = []
    orig = PyramidalLKTracker._maybe_stabilize

    def spy(self, tracks):
        fit = orig(self, tracks)
        engaged.append(fit is not None)
        return fit

    monkeypatch.setattr(PyramidalLKTracker, "_maybe_stabilize", spy)
    for kw in (
        dict(seed=0),  # clean sprites
        dict(seed=1, num_sprites=0, rot_rate=np.deg2rad(1.0), num_frames=16),
        dict(seed=0, noise_sigma=10.0, contrast=0.7, zoom_rate=0.02),
        dict(seed=5, deform_amp=3.0),
    ):
        video, _, _ = make_tracking_scene(**kw)
        tracker = PyramidalLKTracker(
            grid_size=12, device="cpu", matcher="auto"
        )
        tracker(video)
    assert engaged == [False, False, False, False], engaged


def test_roll_gate_pre_empts_rescue(monkeypatch):
    """Two-tier gate: when the pass-1 similarity fit already clears the
    roll gate (consecutive-frame fits survive collapse — measured
    rot_strong 55 deg / inlier 0.89 pre-rescue), the rescue re-track on
    the rolled video is skipped outright (its tracks would be
    discarded). The re-track INSIDE the stabilized result still goes
    through the full policy, so only the outer (pre-gate) call must
    vanish."""
    rescue_calls = []
    orig_rescue = PyramidalLKTracker._maybe_rescue
    orig_stab = PyramidalLKTracker._stabilized_result

    def rescue_spy(self, run, kwargs, tracks, visible):
        rescue_calls.append("outer" if not in_stab else "inner")
        return orig_rescue(self, run, kwargs, tracks, visible)

    in_stab = False

    def stab_spy(self, video, fit):
        nonlocal in_stab
        in_stab = True
        try:
            return orig_stab(self, video, fit)
        finally:
            in_stab = False

    monkeypatch.setattr(PyramidalLKTracker, "_maybe_rescue", rescue_spy)
    monkeypatch.setattr(PyramidalLKTracker, "_stabilized_result", stab_spy)
    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=310, num_sprites=0, rot_rate=np.deg2rad(2.5), num_frames=24
    )
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    assert "outer" not in rescue_calls, rescue_calls
    assert q["pts_within_2"] > 0.9, q


def test_strong_roll_stabilized_retrack_chunked():
    """The chunked (pipeline) path carries the same escalation: the gate
    is evaluated once on the chained full-video tracks, and the re-track
    runs single-shot on the concatenated stabilized luma. 16 frames at
    2.5 deg/frame = 40 deg cumulative, past the 30-deg gate."""
    import jax.numpy as jnp

    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=310, num_sprites=0, rot_rate=np.deg2rad(2.5), num_frames=16
    )
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
    chunks = [jnp.asarray(video[:8]), jnp.asarray(video[8:])]
    out = tracker.track_chunks(chunks, interpret=True)
    q = tracking_quality(
        {"tracks": np.asarray(out["tracks"]),
         "visible": np.asarray(out["visible"])},
        gt_tracks, gt_vis,
    )
    assert q["pts_within_2"] > 0.9, q
    assert q["visibility_accuracy"] > 0.9, q


def test_noise_collapse_denoise_escalation():
    """Appearance-driven collapse (heavy noise over natural texture —
    the regime found by the round-5 gate-margin stress, docs/BENCHMARKS
    "Natural-statistics scenes"): the motion rescue can't help (the
    fine-scale signal is gone, not the motion model), so the auto policy
    escalates to a re-track on Gaussian-smoothed luma. Measured: plain
    classical pts-within-2 0.25 / visibility accuracy 0.12; denoised
    auto 0.44 / 0.76."""
    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=0, noise_sigma=10.0, contrast=0.7, texture="natural"
    )
    plain = PyramidalLKTracker(grid_size=12, device="cpu", matcher=None)
    q_plain = tracking_quality(plain(video), gt_tracks, gt_vis)
    auto = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
    q_auto = tracking_quality(auto(video), gt_tracks, gt_vis)
    assert q_plain["pts_within_2"] < 0.35, q_plain  # the collapse is real
    assert q_auto["pts_within_2"] > q_plain["pts_within_2"] + 0.1, (
        q_plain, q_auto,
    )
    assert q_auto["visibility_accuracy"] > 0.6, q_auto


def test_denoise_never_engages_on_clean_content(monkeypatch):
    """The denoise escalation must be a no-op on healthy content: the
    collapse gate (and the noise floor) keep it off, so clean results
    are bit-identical with and without the policy hook."""
    calls = []
    orig = PyramidalLKTracker._maybe_denoise

    def spy(self, retrack, video, kwargs, tracks, visible, noise_sigma=None):
        out = orig(self, retrack, video, kwargs, tracks, visible,
                   noise_sigma=noise_sigma)
        calls.append(out[2])
        return out

    monkeypatch.setattr(PyramidalLKTracker, "_maybe_denoise", spy)
    video, gt_tracks, gt_vis = make_tracking_scene(seed=0)
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    assert calls == [False], calls  # hook ran, escalation declined
    assert q["pts_within_2"] > 0.9, q


def test_noise_collapse_denoise_chunked():
    """The chunked (pipeline) path carries the denoise escalation with
    the noise estimate taken from the accumulated per-chunk device stats
    (no extra host fetch). Same scene as the single-call test, split in
    two chunks; 16 frames keeps interpret-mode runtime sane."""
    import jax.numpy as jnp

    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=0, noise_sigma=10.0, contrast=0.7, texture="natural",
        num_frames=16,
    )
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
    chunks = [jnp.asarray(video[:8]), jnp.asarray(video[8:])]
    out = tracker.track_chunks(chunks, interpret=True)
    q = tracking_quality(
        {"tracks": np.asarray(out["tracks"]),
         "visible": np.asarray(out["visible"])},
        gt_tracks, gt_vis,
    )
    plain = PyramidalLKTracker(grid_size=12, device="cpu", matcher=None)
    q_plain = tracking_quality(plain(video), gt_tracks, gt_vis)
    assert q["pts_within_2"] > q_plain["pts_within_2"] + 0.1, (q_plain, q)
