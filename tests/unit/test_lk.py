"""Pyramidal-LK tracker: recovers known synthetic motion."""

import numpy as np

from tdspa.ops.lk import track_video_lk


def _textured_frame(h, w, shift_x=0.0, shift_y=0.0, rng_grid=None):
    """Smooth random texture sampled with a subpixel shift."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((h, w))
    for (fx, fy, ph) in rng_grid:
        img += np.sin(2 * np.pi * (fx * (xx - shift_x) / w + fy * (yy - shift_y) / h) + ph)
    img = (img - img.min()) / (np.ptp(img) + 1e-9)
    return np.repeat((img * 255).astype(np.uint8)[..., None], 3, axis=-1)


def _make_video(t, h, w, vx, vy, seed=0):
    rng = np.random.default_rng(seed)
    waves = [(rng.uniform(2, 9), rng.uniform(2, 9), rng.uniform(0, 6)) for _ in range(12)]
    return np.stack(
        [_textured_frame(h, w, shift_x=vx * i, shift_y=vy * i, rng_grid=waves)
         for i in range(t)]
    )


def test_tracks_global_translation():
    T, H, W = 6, 64, 64
    vx, vy = 1.5, -0.8
    video = _make_video(T, H, W, vx, vy)
    queries = np.array(
        [[20.0, 30.0], [32.0, 32.0], [40.0, 20.0], [25.0, 40.0]], np.float32
    )
    tracks, visible = track_video_lk(video, queries, num_levels=2, window=9,
                                     iterations=8)
    tracks = np.asarray(tracks)
    assert tracks.shape == (4, T, 2)
    for n in range(4):
        for t in range(T):
            expected = queries[n] + [vx * t, vy * t]
            np.testing.assert_allclose(tracks[n, t], expected, atol=0.5)
    assert np.asarray(visible).mean() > 0.9


def test_static_video_stays_put():
    video = _make_video(4, 48, 48, 0.0, 0.0)
    queries = np.array([[24.0, 24.0], [10.0, 35.0]], np.float32)
    tracks, visible = track_video_lk(video, queries)
    np.testing.assert_allclose(
        np.asarray(tracks),
        np.broadcast_to(queries[:, None], (2, 4, 2)),
        atol=0.1,
    )
    assert np.asarray(visible).all()


def test_pallas_lk_matches_xla_oracle():
    """The Pallas patch-slice kernel (interpret mode) == the XLA tracker.

    ``corr_radius=0``: the discrete cost-volume argmax can tie-flip between
    adjacent candidates at float precision on this smooth sinusoid scene
    (both paths then GN-polish to equivalent minima); the snap itself is
    parity-tested on a sharp-peak texture in
    ``test_pallas_corr_refine_matches_xla_oracle``.
    """
    import jax.numpy as jnp

    from tdspa.kernels.lk import track_video_lk_pallas

    T, H, W = 6, 64, 64
    video = _make_video(T, H, W, 1.5, -0.8)
    queries = np.array(
        [[20.0, 30.0], [32.0, 32.0], [40.0, 20.0], [25.0, 40.0]], np.float32
    )
    ref_tracks, ref_vis = track_video_lk(
        video, queries, num_levels=2, window=7, iterations=8, corr_radius=0
    )
    got_tracks, got_vis = track_video_lk_pallas(
        video, jnp.asarray(queries), num_levels=2, window=7, iterations=8,
        corr_radius=0, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_tracks), np.asarray(ref_tracks), atol=0.05
    )
    np.testing.assert_array_equal(np.asarray(got_vis), np.asarray(ref_vis))


def _noise_video(t, h, w, vx, vy, seed=3):
    """Integer-shifted hard random texture: NCC peaks are unambiguous."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 64, w + 64)).astype(np.uint8)
    frames = []
    for i in range(t):
        ox, oy = 32 - int(round(vx * i)), 32 - int(round(vy * i))
        frames.append(big[oy : oy + h, ox : ox + w])
    return np.repeat(np.stack(frames)[..., None], 3, axis=-1)


def test_pallas_corr_refine_matches_xla_oracle():
    """Cost-volume refinement parity on a scene with sharp, unambiguous
    correlation peaks (integer-translating white noise): kernel == oracle."""
    import jax.numpy as jnp

    from tdspa.kernels.lk import track_video_lk_pallas

    T, H, W = 5, 64, 64
    video = _noise_video(T, H, W, 3.0, -2.0)
    queries = np.array(
        [[20.0, 30.0], [32.0, 32.0], [40.0, 28.0], [25.0, 40.0]], np.float32
    )
    # iterations=1 under-converges LK on purpose so the snap does real work.
    common = dict(num_levels=1, window=7, iterations=1, corr_radius=4)
    ref_tracks, ref_vis = track_video_lk(video, queries, **common)
    got_tracks, got_vis = track_video_lk_pallas(
        video, jnp.asarray(queries), interpret=True, **common
    )
    np.testing.assert_allclose(
        np.asarray(got_tracks), np.asarray(ref_tracks), atol=0.05
    )
    np.testing.assert_array_equal(np.asarray(got_vis), np.asarray(ref_vis))
    # And the refinement genuinely locks onto the integer motion.
    expected = queries[:, None, :] + np.stack(
        [3.0 * np.arange(T), -2.0 * np.arange(T)], -1
    )[None]
    np.testing.assert_allclose(np.asarray(got_tracks), expected, atol=0.35)


def test_pallas_rescue_level_matches_xla_oracle():
    """Coarse-level cost-volume rescue parity (kernel == oracle), on motion
    fast enough (6 px/frame) that the FINE +-4 cost volume alone cannot
    re-acquire but the level-1 volume (+-8 full-res px) can."""
    import jax.numpy as jnp

    from tdspa.kernels.lk import track_video_lk_pallas

    T, H, W = 4, 256, 256
    video = _noise_video(T, H, W, 6.0, 0.0)
    queries = np.array(
        [[60.0, 90.0], [128.0, 128.0], [160.0, 80.0], [75.0, 180.0]],
        np.float32,
    )
    common = dict(num_levels=2, window=7, iterations=1, corr_radius=4,
                  corr_rescue_level=1)
    ref_tracks, ref_vis = track_video_lk(video, queries, **common)
    got_tracks, got_vis = track_video_lk_pallas(
        video, jnp.asarray(queries), interpret=True, **common
    )
    np.testing.assert_allclose(
        np.asarray(got_tracks), np.asarray(ref_tracks), atol=0.05
    )
    np.testing.assert_array_equal(np.asarray(got_vis), np.asarray(ref_vis))
    # The rescue genuinely locks onto the 6 px/frame integer motion.
    expected = queries[:, None, :] + np.stack(
        [6.0 * np.arange(T), 0.0 * np.arange(T)], -1
    )[None]
    np.testing.assert_allclose(np.asarray(got_tracks), expected, atol=0.35)


def test_pallas_lk_pads_point_count():
    """N not a multiple of 8 pads internally and slices back."""
    import jax.numpy as jnp

    from tdspa.kernels.lk import track_video_lk_pallas

    video = _make_video(4, 64, 64, 0.5, 0.0)
    queries = np.array([[20.0, 30.0], [32.0, 32.0], [40.0, 20.0]], np.float32)
    tracks, vis = track_video_lk_pallas(
        video, jnp.asarray(queries), num_levels=1, interpret=True
    )
    assert np.asarray(tracks).shape == (3, 4, 2)
    assert np.asarray(vis).shape == (3, 4, 1)


def test_point_leaving_frame_marked_invisible():
    T, H, W = 8, 48, 48
    video = _make_video(T, H, W, 8.0, 0.0)  # fast rightward motion
    queries = np.array([[44.0, 24.0]], np.float32)  # near the right edge
    tracks, visible = track_video_lk(video, queries, num_levels=2, window=9,
                                     iterations=8)
    vis = np.asarray(visible)[0, :, 0]
    assert vis[-1] == 0.0  # drifted out of frame by the end


def test_chunked_tracking_matches_unchunked():
    """track_chunks == one call on the concatenated video (interpret mode)."""
    import jax.numpy as jnp

    from tdspa.features.tracks import PyramidalLKTracker
    from tdspa.kernels.lk import track_video_lk_pallas

    T, H, W = 10, 64, 64
    video = _make_video(T, H, W, 1.0, -0.5)
    tracker = PyramidalLKTracker(grid_size=2, num_levels=1, iterations=4)
    queries = jnp.asarray(
        np.array([[20.0, 30.0], [32.0, 32.0], [40.0, 20.0], [25.0, 40.0]],
                 np.float32)
    )
    ref_tracks, ref_vis = track_video_lk_pallas(
        jnp.asarray(video), queries, num_levels=1, iterations=4,
        interpret=True,
    )
    tracker.grid_size = 2  # make_query_grid(64, 64, 2) != queries; bypass:
    import tdspa.features.tracks as tracks_mod

    orig = tracks_mod.make_query_grid
    tracks_mod.make_query_grid = lambda *a, **k: np.asarray(queries)
    try:
        chunks = [jnp.asarray(video[0:4]), jnp.asarray(video[4:8]),
                  jnp.asarray(video[8:10])]
        got = tracker.track_chunks(chunks, interpret=True)
    finally:
        tracks_mod.make_query_grid = orig
    np.testing.assert_allclose(
        np.asarray(got["tracks"]), np.asarray(ref_tracks), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got["visible"]), np.asarray(ref_vis)
    )


def test_pallas_corr_refine_no_strip_wrap():
    """Regression: the corr-refine union patch (span 14 at radius 4 /
    window 7) exceeds the 9 rows a 16-row strip guarantees after the
    8-alignment roll; queries at row phase rj % 8 >= 3 used to read
    cyclically-wrapped rows and lose the track (~12 px error vs the
    oracle). The 24-row staging (kernels/lk.py _load_strips) must match
    the XLA oracle exactly at EVERY row phase."""
    import jax.numpy as jnp

    from tdspa.kernels.lk import track_video_lk_pallas

    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (200, 160, 3)).astype(np.uint8)
    t_frames = 8
    video = np.stack(
        [big[30 - 3 * t : 30 - 3 * t + 160] for t in range(t_frames)]
    )
    ys = np.arange(24, 40).astype(np.float32)  # covers all 8 row phases x2
    queries = np.stack([np.full_like(ys, 80.0), ys], axis=1)

    kw = dict(num_levels=1, window=7, iterations=1, corr_radius=4)
    tr_k, _ = track_video_lk_pallas(
        jnp.asarray(video), jnp.asarray(queries), interpret=True, **kw
    )
    tr_o, _ = track_video_lk(video, queries, **kw)
    np.testing.assert_allclose(
        np.asarray(tr_k), np.asarray(tr_o), atol=1e-3
    )


def test_input_scale_static_video_exact_coords():
    """input_scale=0.5: the half-res coordinate map must round-trip exactly
    — a static video's tracks equal the queries in FULL-res pixels."""
    video = _make_video(4, 256, 256, 0.0, 0.0)
    queries = np.array([[128.0, 128.0], [40.0, 200.0]], np.float32)
    tracks, visible = track_video_lk(video, queries, input_scale=0.5)
    np.testing.assert_allclose(
        np.asarray(tracks),
        np.broadcast_to(queries[:, None], (2, 4, 2)),
        atol=0.2,
    )
    assert np.asarray(visible).all()


def test_input_scale_tracks_translation():
    """Half-res tracking recovers full-res motion in full-res coordinates."""
    T, H, W = 6, 128, 128
    vx, vy = 1.5, -0.8
    video = _make_video(T, H, W, vx, vy)
    queries = np.array([[40.0, 60.0], [64.0, 64.0], [80.0, 40.0]], np.float32)
    tracks, visible = track_video_lk(video, queries, input_scale=0.5)
    t_idx = np.arange(T, dtype=np.float32)
    expected = queries[:, None, :] + np.stack(
        [vx * t_idx, vy * t_idx], axis=-1
    )[None]
    # Half-res sub-pixel accuracy is ~2x the full-res tracker's, and on this
    # deliberately high-frequency texture (wavelength ~7 half-res px) a
    # point may alias out entirely — the contract is that such points are
    # SELF-REPORTED invisible while visible points stay accurate in
    # full-res coordinates (the knob's measured quality cost at the
    # pipeline's 512x512 operating point lives in docs/BENCHMARKS.md).
    err = np.abs(np.asarray(tracks) - expected).max(axis=-1)
    vis = np.asarray(visible)[..., 0] > 0
    assert vis[:, 1:].any(axis=1).sum() >= 2, vis
    assert err[vis].max() < 1.0, err[vis].max()


def test_pallas_input_scale_matches_xla_oracle():
    """Pallas (interpret) == XLA at input_scale=0.5, including the velocity
    output's full-res scaling."""
    import jax.numpy as jnp

    from tdspa.kernels.lk import track_video_lk_pallas

    T, H, W = 6, 128, 128
    video = _make_video(T, H, W, 1.5, -0.8)
    queries = np.array(
        [[40.0, 60.0], [64.0, 64.0], [80.0, 40.0], [50.0, 90.0]], np.float32
    )
    ref_tracks, ref_vis = track_video_lk(
        video, queries, num_levels=2, window=7, iterations=8,
        corr_radius=0, input_scale=0.5,
    )
    got_tracks, got_vis, got_vel = track_video_lk_pallas(
        video, jnp.asarray(queries), num_levels=2, window=7, iterations=8,
        corr_radius=0, input_scale=0.5, interpret=True,
        return_velocity=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_tracks), np.asarray(ref_tracks), atol=0.05
    )
    np.testing.assert_array_equal(np.asarray(got_vis), np.asarray(ref_vis))
    # Velocity is reported in full-res px/frame (chunk chaining contract).
    last_step = np.asarray(got_tracks)[:, -1] - np.asarray(got_tracks)[:, -2]
    np.testing.assert_allclose(np.asarray(got_vel), last_step, atol=0.3)
