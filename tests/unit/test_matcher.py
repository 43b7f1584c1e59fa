"""Learned matcher (CoTracker-class appearance model) — quality + contract.

The reference's front-end is a learned correlation tracker (CoTracker3,
inference.py:97-154). tdspa's classical LK+NCC tracker collapses under
sensor noise / low contrast / exposure flicker because its appearance model
is raw grayscale; tdspa.features.matcher trains a learned appearance model
(feature net + cost-patch head) on synthetic degraded scenes with exact
ground truth. The SHIPPED pretrained matcher (tdspa/assets, see
default_matcher_path for provenance) is validated here with hard thresholds
on held-out degraded scenes — the same style as test_tracking_quality.py —
plus contract tests (shapes, frame-0 template invariant, save/load
roundtrip, offset bounds) and a training-descends smoke test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdspa.eval.tracking_quality import tracking_quality
from tdspa.features.matcher import (
    default_matcher_path,
    init_matcher,
    load_matcher,
    refine_tracks,
    save_matcher,
    train_matcher,
)
from tdspa.features.tracks import PyramidalLKTracker
from tdspa.utils.synthetic_video import make_tracking_scene

# Held-out degradation point (training randomizes over a range containing
# it; eval seeds 100+ are disjoint from the training seeds).
DEGRADE = dict(noise_sigma=15.0, contrast=0.5, gain_flicker=0.15)


@pytest.fixture(scope="module")
def shipped():
    return load_matcher(default_matcher_path())


def test_refine_shapes_and_frame0_invariant():
    params = init_matcher(jax.random.PRNGKey(1), dim=8, radius=2, hidden=16)
    video = np.random.default_rng(0).integers(
        0, 255, (5, 32, 48, 3), dtype=np.uint8
    )
    tracks = np.random.default_rng(1).uniform(4, 28, (7, 5, 2)).astype(
        np.float32
    )
    # rescue=0: the motion-field rescue exists to move points BEYOND the
    # refinement reach, which would void the offset bound below.
    pos, vis = refine_tracks(params, video, tracks, rescue=0)
    assert pos.shape == (7, 5, 2) and vis.shape == (7, 5)
    # Frame 0 defines the template: position untouched, visibility pinned.
    np.testing.assert_array_equal(np.asarray(pos[:, 0]), tracks[:, 0])
    assert bool(jnp.all(vis[:, 0] > 0.0))
    # Each of the 2 refinement iterations moves at most 2*radius feature px
    # = 2*radius*stride image px (soft-argmax within the window +
    # tanh-bounded correction).
    assert float(jnp.max(jnp.abs(pos - tracks))) <= 2 * (2 * 2 * 2.0) + 1e-4


def test_save_load_roundtrip(tmp_path):
    params = init_matcher(jax.random.PRNGKey(2), dim=8, radius=2, hidden=16)
    path = str(tmp_path / "matcher.npz")
    save_matcher(path, params)
    loaded = load_matcher(path)
    video = np.random.default_rng(0).integers(
        0, 255, (4, 32, 48, 3), dtype=np.uint8
    )
    tracks = np.random.default_rng(1).uniform(4, 28, (5, 4, 2)).astype(
        np.float32
    )
    p0, v0 = refine_tracks(params, video, tracks)
    p1, v1 = refine_tracks(loaded, video, tracks)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)


def test_training_descends():
    """Supervision wiring sanity: a tiny config's loss must drop fast."""
    _, log = train_matcher(
        jax.random.PRNGKey(0),
        steps=60,
        num_scenes=4,
        dim=8,
        radius=2,
        hidden=32,
        log_every=59,
        scene_kwargs=dict(num_frames=8, height=64, width=96, grid_size=6),
    )
    assert log[-1][1] < log[0][1] * 0.6, log


def test_tracker_accepts_matcher_path(shipped):
    """PyramidalLKTracker(matcher=<path>) == matcher=<params dict>."""
    video, _, _ = make_tracking_scene(
        num_frames=8, height=96, width=128, grid_size=6, seed=7, **DEGRADE
    )
    by_path = PyramidalLKTracker(
        grid_size=6, device="cpu", matcher=default_matcher_path()
    )
    by_params = PyramidalLKTracker(grid_size=6, device="cpu", matcher=shipped)
    r0, r1 = by_path(video), by_params(video)
    np.testing.assert_allclose(r0["tracks"], r1["tracks"], atol=1e-5)
    np.testing.assert_allclose(r0["visible"], r1["visible"], atol=1e-5)


@pytest.mark.parametrize("seed", (100, 101))
def test_shipped_matcher_beats_classical_under_degradation(shipped, seed):
    """On degraded held-out scenes the learned matcher must beat LK+NCC on
    localization and visibility classification (the classical appearance
    model collapses there: it marks ~half the visible points occluded).
    Measured (round-4 shipped bank-3 weights + motion-field rescue,
    th=0.5, 3-seed means in docs/BENCHMARKS.md "Shipped round-4
    matcher"): pts2 0.942 vs 0.728; acc 0.888 vs 0.520; occ recall
    0.848; visible recall 0.891.
    """
    video, gt_tracks, gt_vis = make_tracking_scene(seed=seed, **DEGRADE)
    base_tracker = PyramidalLKTracker(grid_size=12, device="cpu")
    base = tracking_quality(base_tracker(video), gt_tracks, gt_vis)
    m_tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher=shipped)
    ours = tracking_quality(m_tracker(video), gt_tracks, gt_vis)
    assert ours["pts_within_2"] > 0.9, (base, ours)
    assert ours["pts_within_2"] > base["pts_within_2"] + 0.15, (base, ours)
    assert ours["visibility_accuracy"] > 0.85, (base, ours)
    assert ours["visibility_accuracy"] > base["visibility_accuracy"] + 0.25, (
        base,
        ours,
    )
    assert ours["visible_recall"] > 0.85, (base, ours)
    assert ours["occlusion_recall"] > 0.75, (base, ours)


def test_chunked_matcher_matches_unchunked(shipped, monkeypatch):
    """track_chunks with a matcher == one matcher pass over the full video
    (the matcher is per-frame stateless given the persistent frame-0
    template, and LK chains on its OWN positions)."""
    import tdspa.features.tracks as tracks_mod
    from tdspa.kernels.lk import track_video_lk_pallas

    video, _, _ = make_tracking_scene(
        num_frames=10, height=64, width=64, grid_size=2, seed=5
    )
    queries = np.array(
        [[20.0, 30.0], [32.0, 32.0], [40.0, 20.0], [25.0, 40.0]], np.float32
    )
    tracker = PyramidalLKTracker(
        grid_size=2, num_levels=1, iterations=4, matcher=shipped
    )
    monkeypatch.setattr(
        tracks_mod, "make_query_grid", lambda *a, **k: queries
    )
    lk_tracks, lk_vis = track_video_lk_pallas(
        jnp.asarray(video), jnp.asarray(queries), num_levels=1, iterations=4,
        interpret=True,
    )
    ref_tracks, ref_vis = tracker._apply_matcher(
        jnp.asarray(video), lk_tracks, shipped
    )
    chunks = [jnp.asarray(video[0:4]), jnp.asarray(video[4:8]),
              jnp.asarray(video[8:10])]
    got = tracker.track_chunks(chunks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got["tracks"]), np.asarray(ref_tracks), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(got["visible"]), np.asarray(ref_vis)
    )


def test_shipped_matcher_does_not_break_clean_scene(shipped):
    """On a clean scene the matcher-refined tracker must hold the classical
    quality bars (no regression where LK already excels)."""
    video, gt_tracks, gt_vis = make_tracking_scene(seed=3)
    tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher=shipped)
    q = tracking_quality(tracker(video), gt_tracks, gt_vis)
    # Round-4 weights + rescue measure 0.956 forced-on vs 0.952 classical
    # — forcing the matcher on clean content no longer costs localization.
    assert q["pts_within_2"] > 0.93, q
    assert q["visibility_accuracy"] > 0.85, q


@pytest.mark.parametrize("seed", (200, 201))
def test_shipped_matcher_handles_deforming_content(shipped, seed):
    """Non-rigid warps (smooth analytic deformation field, exact GT —
    tdspa/utils/synthetic_video.py) on top of degradation: the learned
    matcher must keep tracking where classical LK+NCC collapses (the
    CoTracker-class deforming-content regime). Measured (round-4 shipped
    bank-3 weights + motion-field rescue): pts2 0.915 vs 0.544 classical
    (2-seed means), visibility accuracy 0.801 vs 0.385, occlusion recall
    0.932 (docs/BENCHMARKS.md "Shipped round-4 matcher" — the VERDICT-r3
    #5 target of >= 0.9 deform pts2, met by template bank + longer
    training scenes + rescue)."""
    video, gt_tracks, gt_vis = make_tracking_scene(
        seed=seed, deform_amp=5.0, **DEGRADE
    )
    base_tracker = PyramidalLKTracker(grid_size=12, device="cpu")
    base = tracking_quality(base_tracker(video), gt_tracks, gt_vis)
    m_tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher=shipped)
    ours = tracking_quality(m_tracker(video), gt_tracks, gt_vis)
    assert ours["pts_within_2"] > 0.88, (base, ours)
    assert ours["pts_within_2"] > base["pts_within_2"] + 0.3, (base, ours)
    assert ours["visibility_accuracy"] > 0.75, (base, ours)
    assert ours["visibility_accuracy"] > base["visibility_accuracy"] + 0.3, (
        base, ours,
    )
    assert ours["occlusion_recall"] > 0.85, (base, ours)


def test_estimate_degradation_regimes():
    """The auto-engagement estimator: degraded regimes flag, clean and
    affine-motion regimes don't (motion must not read as noise)."""
    from tdspa.features.matcher import estimate_degradation

    flags = {}
    for name, kw in {
        "clean": {},
        "pan": dict(pan=(8, 0)),
        "rot_mild": dict(rot_rate=float(np.deg2rad(1.0)), noise_sigma=10.0,
                         contrast=0.7),
        "degraded": DEGRADE,
        "noise_only": dict(noise_sigma=15.0),
        "low_contrast": dict(contrast=0.35),
        "flicker": dict(gain_flicker=0.15),
    }.items():
        video, _, _ = make_tracking_scene(seed=0, **kw)
        flags[name] = estimate_degradation(video)["degraded"]
    assert not flags["clean"], flags
    assert not flags["pan"], flags       # global motion is not noise
    assert not flags["rot_mild"], flags  # matcher loses here (BENCHMARKS)
    assert flags["degraded"], flags
    assert flags["noise_only"], flags
    assert flags["low_contrast"], flags
    assert flags["flicker"], flags


def test_matcher_auto_mode(shipped):
    """matcher='auto': equals the always-on matcher on degraded content and
    equals the classical tracker on clean content."""
    auto = PyramidalLKTracker(grid_size=6, device="cpu", matcher="auto")
    always = PyramidalLKTracker(grid_size=6, device="cpu", matcher=shipped)
    classic = PyramidalLKTracker(grid_size=6, device="cpu")

    degraded, _, _ = make_tracking_scene(
        num_frames=8, height=96, width=128, grid_size=6, seed=7, **DEGRADE
    )
    np.testing.assert_allclose(
        auto(degraded)["tracks"], always(degraded)["tracks"], atol=1e-5
    )

    clean, _, _ = make_tracking_scene(
        num_frames=8, height=96, width=128, grid_size=6, seed=7
    )
    np.testing.assert_allclose(
        auto(clean)["tracks"], classic(clean)["tracks"], atol=1e-5
    )


def test_auto_escalates_on_tracking_collapse(shipped):
    """Fast pan: every photometric stat reads clean, but the classical
    pass collapses (it marks most (point, frame) pairs occluded). The
    auto policy must detect the collapse (AUTO_LK_OCCLUDED_FRAC) and
    escalate to the cost-volume rescue re-track; a motion collapse the
    rescue fixes does NOT engage the appearance matcher (the rescued
    classical visibility is the more accurate one on pan)."""
    from tdspa.features.matcher import estimate_degradation

    # The benchmark's pan regime (default 24x160x256 scene): enough of the
    # content stays in frame for re-acquisition to matter. (On a much
    # smaller frame the same pan sweeps ~80% of content out of view, the
    # rescue's recovery is marginal, and the policy then legitimately
    # engages the matcher on top.)
    pan, gt_tracks, gt_vis = make_tracking_scene(
        grid_size=8, seed=330, pan=(8, 0)
    )
    # Preconditions: photometrics read clean; the plain pass collapses.
    assert not estimate_degradation(pan)["degraded"]
    classic = PyramidalLKTracker(grid_size=8, device="cpu")
    plain_out = classic(pan)
    assert PyramidalLKTracker._collapse_engage(plain_out["visible"])

    auto = PyramidalLKTracker(grid_size=8, device="cpu", matcher="auto")
    auto_out = auto(pan)
    rescued = PyramidalLKTracker(
        grid_size=8, device="cpu", corr_radius=4, corr_rescue_level=2
    )(pan)
    np.testing.assert_allclose(
        auto_out["tracks"], rescued["tracks"], atol=1e-5
    )
    # The escalation must be a real recovery, not a lateral move.
    q_plain = tracking_quality(plain_out, gt_tracks, gt_vis)
    q_auto = tracking_quality(auto_out, gt_tracks, gt_vis)
    assert q_auto["pts_within_2"] > q_plain["pts_within_2"] + 0.1

    # And a clean scene's healthy occlusion marking stays far from the
    # threshold (no false escalation).
    clean, _, _ = make_tracking_scene(grid_size=8, seed=330)
    assert not PyramidalLKTracker._collapse_engage(classic(clean)["visible"])


def test_matcher_visibility_requires_in_bounds():
    """A point that exits the frame must be invisible even when the learned
    appearance logit says visible (cost patches clamp at feature-map
    borders — round-3 advisor finding): the matcher post-pass ANDs its
    logit with an in-bounds test on the refined positions."""
    params = init_matcher(jax.random.PRNGKey(3), dim=8, radius=2, hidden=16)
    video = np.random.default_rng(0).integers(
        0, 255, (5, 32, 48, 3), dtype=np.uint8
    )
    tracks = np.tile(
        np.array([[24.0, 16.0]], np.float32), (3, 5, 1)
    )
    tracks[0, 2:] = [-30.0, 16.0]   # exits left (x < 0)
    tracks[1, 3:] = [24.0, 90.0]    # exits bottom (y > H-1)
    # Threshold -inf: the learned logit ALWAYS passes, so any zero
    # visibility below can only come from the in-bounds test.
    tracker = PyramidalLKTracker(
        grid_size=2, device="cpu", matcher=params,
        matcher_vis_threshold=-1e9,
    )
    pos, vis = tracker._apply_matcher(jnp.asarray(video), tracks, params)
    pos, vis = np.asarray(pos), np.asarray(vis)[..., 0]
    # Refinement corrections are tanh-bounded (< ~9 px here), far smaller
    # than the 30+ px out-of-bounds margins: the exited points stay out.
    assert (vis[0, 2:] == 0).all(), (pos[0], vis[0])
    assert (vis[1, 3:] == 0).all(), (pos[1], vis[1])
    assert (vis[2] == 1).all(), (pos[2], vis[2])  # in-bounds point stays


def test_estimate_degradation_short_video():
    """T < 3 has no second difference: flicker must be a defined 0.0, not
    a NaN that silently reads as 'not degraded' (round-3 advisor)."""
    from tdspa.features.matcher import estimate_degradation

    video, _, _ = make_tracking_scene(num_frames=2, seed=0,
                                      noise_sigma=15.0)
    est = estimate_degradation(video)
    assert np.isfinite(est["flicker"]) and est["flicker"] == 0.0
    assert est["degraded"]  # the noise term still decides

    clean2, _, _ = make_tracking_scene(num_frames=2, seed=0)
    est2 = estimate_degradation(clean2)
    assert est2["flicker"] == 0.0 and not est2["degraded"]


def test_chunked_auto_engages_on_mid_stream_degradation(shipped, monkeypatch):
    """matcher='auto' + chunked tracking: degradation that BEGINS after the
    first chunk must still engage the matcher (the decision accumulates
    per-chunk stats and is made after all chunks — round-3 advisor flagged
    the old first-chunk-only decision)."""
    import tdspa.features.tracks as tracks_mod

    clean, _, _ = make_tracking_scene(
        num_frames=10, height=64, width=64, grid_size=2, seed=5
    )
    video = clean.copy().astype(np.float32)
    rng = np.random.default_rng(0)
    video[4:] = np.clip(
        video[4:] + rng.normal(0, 20.0, video[4:].shape), 0, 255
    )
    video = video.astype(np.uint8)
    queries = np.array(
        [[20.0, 30.0], [32.0, 32.0], [40.0, 20.0], [25.0, 40.0]], np.float32
    )
    monkeypatch.setattr(tracks_mod, "make_query_grid", lambda *a, **k: queries)
    chunks = [jnp.asarray(video[0:4]), jnp.asarray(video[4:8]),
              jnp.asarray(video[8:10])]
    auto = PyramidalLKTracker(grid_size=2, num_levels=1, iterations=4,
                              matcher="auto")
    always = PyramidalLKTracker(grid_size=2, num_levels=1, iterations=4,
                                matcher=shipped)
    got = auto.track_chunks(chunks, interpret=True)
    ref = always.track_chunks(chunks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got["tracks"]), np.asarray(ref["tracks"]), atol=1e-5
    )
    # Clean video: auto stays off — chunked result equals the classical one.
    chunks_clean = [jnp.asarray(clean[0:4]), jnp.asarray(clean[4:8]),
                    jnp.asarray(clean[8:10])]
    classic = PyramidalLKTracker(grid_size=2, num_levels=1, iterations=4)
    got_clean = auto.track_chunks(chunks_clean, interpret=True)
    ref_clean = classic.track_chunks(chunks_clean, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_clean["tracks"]), np.asarray(ref_clean["tracks"]),
        atol=1e-5,
    )


def test_estimate_degradation_held_out_regimes():
    """Gate generalization on degradations it was NEVER tuned on
    (VERDICT-r3 #6; regimes also held out of matcher training): the gate
    must stay OFF wherever the matcher measured neutral-or-negative and
    engage where it measured positive. Measured regime-by-regime deltas in
    examples/matcher_benchmark.py runs (docs/BENCHMARKS.md round 4 "Gate
    generalization"): jpeg_heavy matcher-neutral (pts2 -0.003), jpeg_mild
    neutral, motion_blur acc -0.018 -> OFF is correct for all three;
    blur_noise matcher-positive (noise dominates) -> ON."""
    from tdspa.features.matcher import estimate_degradation

    decisions = {}
    for name, kw in {
        "jpeg_heavy": dict(jpeg_quality=10),
        "jpeg_mild": dict(jpeg_quality=60),
        "motion_blur": dict(motion_blur=1),
        "blur_noise": dict(motion_blur=1, noise_sigma=12.0),
    }.items():
        video, _, _ = make_tracking_scene(seed=400, **kw)
        decisions[name] = estimate_degradation(video)["degraded"]
    assert not decisions["jpeg_heavy"], decisions
    assert not decisions["jpeg_mild"], decisions
    assert not decisions["motion_blur"], decisions
    assert decisions["blur_noise"], decisions


def test_estimate_degradation_not_fooled_by_drift_or_cut():
    """Legitimate global luma changes must not read as exposure flicker:
    a fast linear fade (60% in one second) and a hard scene cut both keep
    flicker ~0 (second differences of frame means; the cut's two outliers
    fall to the median)."""
    from tdspa.features.matcher import estimate_degradation

    video, _, _ = make_tracking_scene(seed=0)
    ramp = np.linspace(1.5, 0.6, video.shape[0])[:, None, None, None]
    drift = np.clip(video.astype(np.float32) * ramp, 0, 255).astype(np.uint8)
    assert not estimate_degradation(drift)["degraded"]

    cut = video.copy()
    cut[12:] = make_tracking_scene(seed=9)[0][12:]
    assert not estimate_degradation(cut)["degraded"]

    flick, _, _ = make_tracking_scene(seed=0, gain_flicker=0.15)
    assert estimate_degradation(flick)["degraded"]


def test_field_candidate_interpolates_smooth_field():
    """_field_candidate: a lost point's position is recovered from its
    confident neighbors' displacements when the field is smooth (affine
    here — the regime rescue targets: deformation/rotation/pan)."""
    from tdspa.features.matcher import _field_candidate

    rng = np.random.default_rng(0)
    n, t = 40, 6
    x0 = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    aff = np.array([[1.02, 0.01], [-0.01, 0.98]], np.float32)
    disp = x0 @ aff.T - x0
    ramp = np.arange(1, t + 1, dtype=np.float32)[None, :, None] / t
    pos = jnp.asarray(x0[:, None, :] + disp[:, None, :] * ramp)
    vis = jnp.full((n, t), 3.0).at[0].set(-5.0)  # point 0 is lost
    cand = _field_candidate(jnp.asarray(x0), pos, vis)
    # The lost point's candidate lands on the true field (its own bogus
    # displacement must not pollute the vote — self-weight is zero).
    assert float(jnp.abs(cand[0] - pos[0]).max()) < 1.5
    # Confident points' candidates also sit on the field (consistency).
    assert float(jnp.abs(cand[1:] - pos[1:]).max()) < 1.5


def test_rescue_recovers_far_initializations(shipped):
    """Motion-field rescue: initializations beyond the head's search reach
    (> 2*radius*stride px off) are unrecoverable by refinement alone
    (measured 0% for >16 px, docs/BENCHMARKS.md round 4); the rescue's
    geometric candidate + re-refine recovers most of them, and unperturbed
    points are untouched."""
    video, gt_tracks, gt_vis = make_tracking_scene(seed=7, pan=(3, 1))
    n = gt_tracks.shape[0]
    bad = np.zeros(n, bool)
    bad[:: 4] = True  # every 4th point starts ~20 px off
    init = gt_tracks.copy()
    init[bad, 1:] += np.array([14.0, -14.0], np.float32)
    vis_w = gt_vis[..., 0] if gt_vis.ndim == 3 else gt_vis

    def err_frac_within2(pos):
        err = np.linalg.norm(np.asarray(pos) - gt_tracks, axis=-1)
        ok = (err <= 2.0) & (vis_w > 0.5)
        return [
            ok[sel].sum() / np.maximum((vis_w[sel] > 0.5).sum(), 1)
            for sel in (bad, ~bad)
        ]

    p0, _ = refine_tracks(shipped, video, init, rescue=0)
    p1, _ = refine_tracks(shipped, video, init, rescue=1)
    bad0, good0 = err_frac_within2(p0)
    bad1, good1 = err_frac_within2(p1)
    assert bad0 < 0.3, (bad0, good0)          # lost without rescue
    assert bad1 > bad0 + 0.4, (bad0, bad1)    # rescue recovers them
    assert good1 >= good0 - 0.02, (good0, good1)  # others untouched
