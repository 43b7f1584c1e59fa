"""Global-similarity fit + gather-free video warp (tdspa/ops/warp.py).

The warp is the TPU-native stabilization primitive behind the tracker's
camera-roll escalation (reference capability slot: inference.py:97-154 —
CoTracker3 absorbs camera motion into learned features; we compensate it
explicitly). Correctness contract: the Paeth-shear +
scale_and_translate composition must match a map_coordinates gather
oracle on every pixel whose TRUE source lies inside the original frame
(extrapolation regions legitimately differ: the oracle edge-clamps in
one step, the multi-pass warp pads per pass).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tdspa.ops.warp import (
    apply_similarity,
    fit_similarity_sequence,
    warp_similarity_oracle,
    warp_video_similarity,
)


def _smooth_video(t, h, w, seed=0):
    """Band-limited random frames (blocky content amplifies legitimate
    interpolation-scheme differences; trackers consume smooth pyramids)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (t, h // 8, w // 8)).astype(np.float32)
    up = np.kron(base, np.ones((1, 8, 8), np.float32))
    k = np.ones(9, np.float32) / 9.0
    for axis in (1, 2):
        up = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), axis, up
        )
    return up


def _similarity_sequence(t, angles_deg, scales, trans):
    th = np.deg2rad(np.asarray(angles_deg, np.float64))
    a = np.zeros((t, 2, 2), np.float32)
    a[:, 0, 0] = np.cos(th) * scales
    a[:, 0, 1] = -np.sin(th) * scales
    a[:, 1, 0] = np.sin(th) * scales
    a[:, 1, 1] = np.cos(th) * scales
    return a, np.asarray(trans, np.float32)


class TestFitSimilaritySequence:
    def _tracks_from_transforms(self, a_mat, t_vec, n=60, seed=0):
        rng = np.random.default_rng(seed)
        p0 = rng.uniform(20, 200, (n, 2)).astype(np.float32)
        # p_t = A_t p_0 + t_t  (frame-0-referenced ground truth)
        return np.einsum("tij,nj->nti", a_mat, p0) + t_vec[None]

    def test_recovers_known_similarity(self):
        t = 12
        angles = np.linspace(0, 44, t)
        scales = np.linspace(1.0, 1.1, t)
        trans = np.stack(
            [np.linspace(0, 9, t), np.linspace(0, -6, t)], -1
        )
        a_mat, t_vec = _similarity_sequence(t, angles, scales, trans)
        tracks = self._tracks_from_transforms(a_mat, t_vec)
        fit = fit_similarity_sequence(tracks)
        np.testing.assert_allclose(fit["angle_deg"], angles, atol=0.2)
        np.testing.assert_allclose(fit["scale"], scales, atol=5e-3)
        np.testing.assert_allclose(fit["A"], a_mat, atol=5e-3)
        np.testing.assert_allclose(fit["t"], t_vec, atol=0.7)
        assert float(jnp.min(fit["inlier_frac"])) > 0.95

    def test_robust_to_outlier_tracks(self):
        """A third of the points drifting randomly must not corrupt the
        fit — the hard inlier reweighting prunes them."""
        t = 10
        angles = np.linspace(0, 36, t)
        a_mat, t_vec = _similarity_sequence(
            t, angles, np.ones(t), np.zeros((t, 2))
        )
        tracks = self._tracks_from_transforms(a_mat, t_vec, n=90)
        rng = np.random.default_rng(3)
        bad = rng.choice(90, 30, replace=False)
        tracks[bad] += rng.uniform(-40, 40, (30, t, 2)).astype(np.float32)
        fit = fit_similarity_sequence(tracks)
        np.testing.assert_allclose(fit["angle_deg"], angles, atol=0.5)
        np.testing.assert_allclose(fit["scale"], np.ones(t), atol=0.01)

    def test_large_cumulative_rotation_survives(self):
        """Frame-0-referenced fits starve past ~40 deg; the
        consecutive-frame + compose design must hold to 100+ deg."""
        t = 30
        angles = np.linspace(0, 116, t)
        a_mat, t_vec = _similarity_sequence(
            t, angles, np.ones(t), np.zeros((t, 2))
        )
        tracks = self._tracks_from_transforms(a_mat, t_vec)
        fit = fit_similarity_sequence(tracks)
        np.testing.assert_allclose(fit["angle_deg"], angles, atol=1.0)
        assert float(jnp.min(fit["inlier_frac"])) > 0.95

    def test_degenerate_fit_falls_back_to_identity(self):
        """Fewer inliers than min_inliers => identity transform, not a
        garbage extrapolation (pan scenes produce exactly this)."""
        rng = np.random.default_rng(0)
        tracks = rng.uniform(0, 200, (6, 8, 2)).astype(np.float32)
        fit = fit_similarity_sequence(tracks, min_inliers=7)
        np.testing.assert_allclose(
            fit["A"], np.broadcast_to(np.eye(2), (8, 2, 2)), atol=1e-5
        )
        np.testing.assert_allclose(fit["t"], np.zeros((8, 2)), atol=1e-5)

    def test_apply_similarity_inverts_fit(self):
        t = 8
        angles = np.linspace(0, 21, t)
        a_mat, t_vec = _similarity_sequence(
            t, angles, np.linspace(1, 1.05, t), np.zeros((t, 2))
        )
        tracks = self._tracks_from_transforms(a_mat, t_vec, n=15)
        # Stabilized coords == frame-0 position; mapping forward must
        # land on the original per-frame positions.
        p0 = tracks[:, :1].repeat(t, 1)
        mapped = apply_similarity(jnp.asarray(a_mat), jnp.asarray(t_vec),
                                  jnp.asarray(p0))
        np.testing.assert_allclose(mapped, tracks, atol=1e-3)


def _valid_source_mask(h, w, a_mat, t_vec):
    """Pixels whose backward-mapped source lies strictly inside the
    original frame (with a 2px guard band for interpolation support)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)
    src = base @ np.asarray(a_mat).T + np.asarray(t_vec)
    ok = (
        (src[:, 0] >= 2) & (src[:, 0] <= w - 3)
        & (src[:, 1] >= 2) & (src[:, 1] <= h - 3)
    )
    return ok.reshape(h, w)


class TestWarpVideoSimilarity:
    @pytest.mark.parametrize("case", ["roll", "roll_scale_shift", "strong"])
    def test_matches_gather_oracle_on_valid_pixels(self, case):
        t, h, w = 6, 128, 128
        video = _smooth_video(t, h, w)
        if case == "roll":
            angles = np.linspace(0, 35, t)
            scales, trans = np.ones(t), np.zeros((t, 2))
        elif case == "roll_scale_shift":
            angles = np.linspace(0, 25, t)
            scales = np.linspace(1.0, 1.08, t)
            trans = np.stack(
                [np.linspace(0, 6, t), np.linspace(0, -4, t)], -1
            )
        else:  # strong: past the single-application shear budget
            angles = np.linspace(0, 80, t)
            scales, trans = np.ones(t), np.zeros((t, 2))
        a_mat, t_vec = _similarity_sequence(t, angles, scales, trans)

        got = np.asarray(warp_video_similarity(video, a_mat, t_vec))
        want = np.asarray(warp_similarity_oracle(video, a_mat, t_vec))
        for f in range(t):
            mask = _valid_source_mask(h, w, a_mat[f], t_vec[f])
            if mask.sum() == 0:
                continue
            err = np.abs(got[f] - want[f])[mask]
            # Multi-pass interpolation (3 shears + scale/translate) has a
            # legitimately heavier tail than the oracle's single bilinear
            # sample; formula/composition bugs produce tens of levels.
            assert err.mean() < 1.5, (case, f, err.mean())
            assert np.percentile(err, 99) < 8.0, (case, f)

    def test_identity_transform_is_near_noop(self):
        t, h, w = 3, 64, 64
        video = _smooth_video(t, h, w, seed=1)
        a_mat, t_vec = _similarity_sequence(
            t, np.zeros(t), np.ones(t), np.zeros((t, 2))
        )
        got = np.asarray(warp_video_similarity(video, a_mat, t_vec))
        np.testing.assert_allclose(got, video, atol=0.25)

    def test_stabilizes_rotating_content(self):
        """End-to-end semantic check: render frame t as frame-0 content
        rotated by theta_t (oracle), stabilize with the TRUE transforms,
        and require every stabilized frame ~= frame 0 on valid pixels."""
        t, h, w = 5, 128, 128
        frame0 = _smooth_video(1, h, w, seed=2)[0]
        angles = np.linspace(0, 40, t)
        a_mat, t_vec = _similarity_sequence(
            t, angles, np.ones(t), np.zeros((t, 2))
        )
        # Rotation about the center: p_t = A(p_0 - c) + c, so the
        # frame-0 -> frame-t similarity has t = c - A c.
        ctr = np.asarray([(w - 1) / 2.0, (h - 1) / 2.0], np.float32)
        t_vec = ctr[None] - np.einsum("tij,j->ti", a_mat, ctr)
        # Render: frame_t(p) = frame0(A^-1 (p - t)) -> use the oracle
        # with the inverse transform.
        a_inv = np.linalg.inv(a_mat)
        t_inv = -np.einsum("tij,tj->ti", a_inv, t_vec)
        video = np.asarray(
            warp_similarity_oracle(
                np.broadcast_to(frame0, (t, h, w)), a_inv, t_inv
            )
        )
        stab = np.asarray(warp_video_similarity(video, a_mat, t_vec))
        for f in range(t):
            # Valid = pixels surviving the round trip through frame t.
            mask = _valid_source_mask(h, w, a_inv[f], t_inv[f])
            mask &= _valid_source_mask(h, w, a_mat[f], t_vec[f])
            err = np.abs(stab[f] - frame0)[mask]
            assert err.mean() < 2.5, (f, err.mean())


class TestStabilizationBudget:
    """Regression tests for the ADVICE-r4 findings: the warp's cumulative-
    roll budget must be enforced by the tracker gate, and the stabilized
    re-track must see the ORIGINAL (h, w) frame, not the %8-padded one."""

    def _rotating_tracks(self, deg_per_frame, num_frames, n=40, seed=0):
        rng = np.random.default_rng(seed)
        p0 = rng.uniform(30, 200, (n, 2)).astype(np.float32)
        ctr = np.asarray([128.0, 96.0], np.float32)
        th = np.deg2rad(deg_per_frame) * np.arange(num_frames)
        rot = np.stack(
            [
                np.stack([np.cos(th), -np.sin(th)], -1),
                np.stack([np.sin(th), np.cos(th)], -1),
            ],
            -2,
        ).astype(np.float32)
        return np.einsum("tij,nj->nti", rot, p0 - ctr) + ctr

    def test_gate_declines_past_warp_budget(self):
        """120-deg cumulative roll exceeds MAX_WARP_ANGLE_DEG: the gate
        must return None (a corrupted stabilized re-track would silently
        replace the classical result — ADVICE r4, warp.py:224)."""
        from tdspa.features.tracks import (
            STAB_MAX_ANGLE_DEG,
            PyramidalLKTracker,
        )
        from tdspa.ops.warp import MAX_WARP_ANGLE_DEG

        assert STAB_MAX_ANGLE_DEG <= MAX_WARP_ANGLE_DEG
        tracker = PyramidalLKTracker(grid_size=12, device="cpu", matcher="auto")
        over = self._rotating_tracks(5.0, 25)  # 120 deg cumulative
        assert tracker._maybe_stabilize(over) is None
        under = self._rotating_tracks(2.5, 24)  # 57.5 deg: engages
        assert tracker._maybe_stabilize(under) is not None

    def test_retrack_sees_original_frame_shape(self, monkeypatch):
        """Non-%8 frames are padded for the warp; the re-track must run on
        the CROPPED original (h, w) so its query grid matches
        make_query_grid(h, w) (ADVICE r4, tracks.py:263)."""
        from tdspa.features.tracks import PyramidalLKTracker

        t, h, w = 4, 100, 108  # pad_h=4, pad_w=4
        video = np.repeat(
            _smooth_video(t, 104, 112, seed=3)[:, :h, :w, None], 3, axis=-1
        ).astype(np.float32)
        a_mat, t_vec = _similarity_sequence(
            t, np.zeros(t), np.ones(t), np.zeros((t, 2))
        )
        fit = {"A": jnp.asarray(a_mat), "t": jnp.asarray(t_vec)}

        seen = []
        n = 9

        def fake_call(self, vid, _allow_stabilize=True):
            seen.append((tuple(np.shape(vid)), _allow_stabilize))
            return {
                "tracks": np.zeros((n, t, 2), np.float32),
                "visible": np.ones((n, t, 1), np.float32),
            }

        monkeypatch.setattr(PyramidalLKTracker, "__call__", fake_call)
        tracker = PyramidalLKTracker(grid_size=3, device="cpu", matcher="auto")
        out = tracker._stabilized_result(video, fit)
        assert seen == [((t, h, w), False)], seen
        assert out["tracks"].shape == (n, t, 2)
        # Identity fit: mapped-back positions unchanged, visibility kept.
        assert np.all(out["visible"] == 1.0)
