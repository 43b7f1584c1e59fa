"""2D point-track providers: the pluggable front-end of the pipeline.

The model contract only needs ``{'tracks': [N T 2], 'visible': [N T 1]}``
(reference inference.py:97-154), so tracking is a provider interface:

* ``CoTrackerProvider`` — the reference's CoTracker3 torch adapter (gated on
  the ``cotracker`` package): dense grid_size^2 queries at frame 0 with
  half-pixel centers in CoTracker's (t, y, x) layout.
* ``PrecomputedTrackProvider`` — tracks from an .npz (cache CoTracker output
  once on a GPU box, run the TPU pipeline anywhere).
* ``PyramidalLKTracker`` — a pure-JAX coarse-to-fine Lucas-Kanade tracker
  (tdspa.ops.lk) that runs ON the TPU: no torch dependency, keeps the
  end-to-end pipeline self-contained. Occlusion reasoning = forward-backward
  consistency + center-weighted window-NCC appearance checks (occlusion
  recall >= 0.83 on every synthetic ground-truth seed at sub-0.13px
  both-visible EPE, tests/unit/test_tracking_quality.py); ``corr_radius``
  adds a CoTracker-style frame-0 cost-volume re-localizer for drift-heavy
  content (docs/BENCHMARKS.md round 3 for when to enable it). Still short
  of CoTracker3's learned matching on textureless/deforming content, but a
  quantified tracker, not a stub.
* ``StaticGridProvider`` — grid positions held constant; the degenerate
  fallback for smoke tests.
"""

from __future__ import annotations

from absl import logging
import numpy as np

# Stabilized-re-track escalation gate (auto mode): engage when the global
# motion fitted from the classical pass's own tracks shows a cumulative
# roll no translation-template tracker can follow, AND the fit is
# credible. Measured on the synthetic scene zoo (docs/BENCHMARKS.md
# round 4): rot_strong 57 deg / median inlier 0.74-0.83 (engage);
# rot_slow 14.5 deg, zoom+roll 25.8 deg, zoom 0.3 deg, fast pan median
# inlier 0.05 (all stay off — rescue/matcher already handle those).
STAB_MIN_ANGLE_DEG = 30.0
STAB_MIN_INLIER = 0.5
# Upper bound: the gather-free warp's shear pad is exceeded past its
# ~100-deg cumulative-roll budget (tdspa/ops/warp.py MAX_WARP_ANGLE_DEG;
# measured vs the gather oracle: 18% of valid pixels >20 gray-levels wrong
# at 150 deg). Beyond it a corrupted stabilized re-track would silently
# replace the classical result, so the gate declines to escalate.
STAB_MAX_ANGLE_DEG = 100.0

# Denoise escalation (auto mode): when the pass is STILL collapsed after
# the motion rescue AND the frames actually look noisy, re-track on
# Gaussian-smoothed luma (tdspa/ops/filters.py). Heavy sensor noise over
# weak natural-statistics texture swamps LK's fine-scale gradients (the
# normal equations go noise-dominated; measured: natural texture dies at
# estimated noise ~7 where cell texture survives to ~12) — smoothing
# trades sub-pixel locking for recovered signal. Measured on the
# natural/degraded scene: pts-within-2 0.25 -> 0.46, visibility accuracy
# 0.12 -> 0.77 (docs/BENCHMARKS.md "Natural-statistics scenes").
AUTO_DENOISE_SIGMA = 3.0
# Engage only when estimated sensor noise is material — a clean scene
# whose points genuinely left the frame keeps its honest visibility.
AUTO_DENOISE_MIN_NOISE = 4.0
# Keep bar (occluded-marking drop); 5x the motion rescue's 0.02 because
# blur also RELAXES the NCC acceptance checks, so a small drop is not by
# itself evidence of recovered signal.
AUTO_DENOISE_MIN_DROP = 0.1


def make_query_grid(height: int, width: int, grid_size: int) -> np.ndarray:
    """[grid_size^2, 2] (x, y) half-pixel-centered query grid at frame 0.

    Matches the reference's loop (inference.py:124-133): row-major over
    (i=y, j=x), centers at (j+0.5)*W/g, (i+0.5)*H/g.
    """
    step_x, step_y = width / grid_size, height / grid_size
    j = np.tile(np.arange(grid_size), grid_size)
    i = np.repeat(np.arange(grid_size), grid_size)
    return np.stack([(j + 0.5) * step_x, (i + 0.5) * step_y], axis=1).astype(
        np.float32
    )


class StaticGridProvider:
    """Grid points, zero motion, full visibility (smoke-test fallback)."""

    def __init__(self, grid_size: int = 64):
        self.grid_size = grid_size

    def __call__(self, video: np.ndarray) -> dict:
        t, h, w = video.shape[:3]
        grid = make_query_grid(h, w, self.grid_size)  # [N 2]
        tracks = np.broadcast_to(grid[:, None, :], (grid.shape[0], t, 2)).copy()
        visible = np.ones((grid.shape[0], t, 1), np.float32)
        return {"tracks": tracks.astype(np.float32), "visible": visible}


class PrecomputedTrackProvider:
    """Tracks from an .npz with 'tracks' [N T 2] and 'visible' [N T (1)]."""

    def __init__(self, npz_path: str):
        self.npz_path = npz_path

    def __call__(self, video: np.ndarray) -> dict:
        data = np.load(self.npz_path)
        tracks = np.asarray(data["tracks"], np.float32)
        visible = np.asarray(data["visible"], np.float32)
        if visible.ndim == 2:
            visible = visible[..., None]
        return {"tracks": tracks, "visible": visible}


class PyramidalLKTracker:
    """Pure-JAX pyramidal Lucas-Kanade grid tracker.

    Backend selection ('auto'): on TPU, the Pallas dynamic-patch-slice
    kernel (tdspa/kernels/lk.py) — XLA lowers this tracker's window sampling
    to gathers the TPU executes catastrophically slowly (~7 s/frame-pair at
    4096 points on v5e), while the kernel runs the full 150-frame 64x64-grid
    workload in ~16 s on-chip vs ~45 s on a host core. Elsewhere, the XLA
    implementation on the host CPU backend.
    """

    def __init__(
        self,
        grid_size: int = 64,
        num_levels: int = 3,
        window: int = 7,
        iterations: int = 4,
        fb_threshold: float = 2.0,
        ncc_threshold: float = 0.7,
        template_ncc_threshold: float = 0.5,
        corr_radius: int = 0,
        corr_iterations: int = 2,
        corr_accept: float = 0.85,
        corr_rescue_level: int = 0,
        matcher=None,  # None | params dict | path to a matcher .npz
        matcher_vis_threshold: float = 0.5,
        device: str = "auto",  # 'auto' | 'pallas' | 'cpu' | 'default'
        input_scale: float = 1.0,  # 0.5 = half-res tracking (serving knob)
    ):
        self.grid_size = grid_size
        self.num_levels = num_levels
        self.window = window
        self.iterations = iterations
        # Half-res tracking drops the finest pyramid level's share of the
        # kernel work (~1/3 at 3 levels); sub-pixel accuracy cost measured
        # in docs/BENCHMARKS.md "Tracking input-scale knob". Coordinates
        # stay full-res everywhere outside the LK backends.
        self.input_scale = input_scale
        self.fb_threshold = fb_threshold
        self.ncc_threshold = ncc_threshold
        self.template_ncc_threshold = template_ncc_threshold
        self.corr_radius = corr_radius
        self.corr_iterations = corr_iterations
        self.corr_accept = corr_accept
        self.corr_rescue_level = corr_rescue_level
        if isinstance(matcher, str) and matcher != "auto":
            from tdspa.features.matcher import load_matcher

            matcher = load_matcher(matcher)
        # 'auto': per-video decision — engage the shipped matcher when the
        # video looks photometrically degraded (thresholds + calibration in
        # tdspa/features/matcher.py::estimate_degradation) OR when the
        # classical pass itself collapsed (it marks an implausibly large
        # fraction of (point, frame) pairs occluded — fast pan does this
        # with clean-looking frames; AUTO_LK_OCCLUDED_FRAC). The matcher
        # wins big on both and mildly loses on clean/affine-motion content.
        # Chunked tracking (track_chunks) decides from per-chunk stats
        # after ALL chunks — engaging if ANY chunk looks degraded — so
        # mid-stream degradation also triggers; __call__ estimates on the
        # full video in one shot. Both paths see the same collapse signal.
        self.matcher = matcher
        self._auto_matcher_params = None
        # Decision threshold on the matcher's visibility logit. 0.0 is the
        # BCE-optimal cut but under-calls occlusion (class imbalance even
        # after loss re-weighting); 0.5 measured best-balanced for the
        # shipped weights on held-out degraded scenes (occ recall
        # 0.77-0.89 at vis recall ~0.90, sweep in docs/BENCHMARKS.md).
        self.matcher_vis_threshold = matcher_vis_threshold
        self.device = device

    def _matcher_for(self, video, lk_visible=None, rescue_drop=0.0,
                     denoised=False):
        """The matcher params to apply for THIS video (None = don't).

        lk_visible: the classical pass's visibility output ([N T] or
        [N T 1]), enabling the tracking-collapse signal in 'auto' mode
        (one scalar fetch; see AUTO_LK_OCCLUDED_FRAC in features/matcher).
        rescue_drop: how much the accepted rescue re-track reduced the
        occluded-marking fraction (see _maybe_rescue). A rescue that
        clearly recovered (drop >= 0.1) means the collapse was MOTION, now
        fixed — the appearance matcher is not engaged on collapse grounds
        (measured: on fast pan the rescued classical visibility is more
        accurate than the matcher's, 0.81 vs 0.66).
        denoised: an accepted denoised re-track (see _maybe_denoise)
        SUPPRESSES the matcher: the blur recovery is the final answer.
        Measured on the natural/degraded scene: the cells-trained round-4
        matcher refining the denoised tracks on the original noisy frames
        collapses the result right back (0.46 pts-within-2 -> 0.17 — its
        cost patches are off-distribution there), while the denoised
        classical pass holds 0.46 / 0.77 visibility accuracy.
        """
        if self.matcher is None:
            return None
        if not isinstance(self.matcher, str):
            return self.matcher
        # 'auto' mode: photometric degradation OR unrescued tracking
        # collapse; an engaged denoise escalation suppresses both.
        from tdspa.features.matcher import estimate_degradation, load_matcher

        engage = not denoised and (
            estimate_degradation(video)["degraded"]
            or (
                lk_visible is not None
                and rescue_drop < 0.1
                and self._collapse_engage(lk_visible)
            )
        )
        if not engage:
            return None
        if self._auto_matcher_params is None:
            self._auto_matcher_params = load_matcher("default")
        return self._auto_matcher_params

    def _maybe_rescue(self, run, kwargs, tracks, visible):
        """Auto-mode escalation: if the plain pass collapsed, re-track with
        the frame-0 cost-volume re-localizer + coarse rescue.

        Rescue is off by default because re-acquisition trades occlusion
        recall on healthy content (docs/BENCHMARKS.md "Fast motion") — but
        a collapsed pass (occluded-marking > AUTO_LK_OCCLUDED_FRAC) is
        already degenerate, so the trade is strictly good there: measured
        pts-within-2 0.31 -> 0.72 on fast pan, +0.02 elsewhere, exact
        no-op on healthy content (never triggers). The re-track is kept
        only when it recovers meaningfully (occluded-marking drops > 0.02
        — appearance-driven collapse, e.g. heavy noise, is motion-rescue-
        proof and keeps the plain result for the matcher to fix).

        run: callable(kwargs) -> (tracks, visible) re-running the tracker.
        Returns (tracks, visible, occluded-marking drop).
        """
        if not (
            isinstance(self.matcher, str)  # adaptive policy = 'auto' only
            and self.corr_radius == 0  # user-set corr config wins
            and self._collapse_engage(visible)
        ):
            return tracks, visible, 0.0
        rescued_tracks, rescued_visible = run(
            dict(kwargs, corr_radius=4, corr_rescue_level=2)
        )
        drop = self._occluded_frac(visible) - self._occluded_frac(
            rescued_visible
        )
        if drop > 0.02:
            return rescued_tracks, rescued_visible, drop
        return tracks, visible, 0.0

    def _maybe_denoise(self, retrack, video, kwargs, tracks, visible,
                       noise_sigma=None):
        """Auto-mode escalation for APPEARANCE-driven collapse: re-track
        on Gaussian-smoothed luma.

        The motion rescue is appearance-blind — heavy noise over weak
        (natural-statistics) texture defeats it because the SIGNAL is
        gone at the finest scale, not the motion model (measured:
        rescue drop ~0 on the natural/degraded scene while a sigma-3
        pre-blur re-track recovers pts-within-2 0.25 -> 0.46 and
        visibility accuracy 0.12 -> 0.77). Engages only when (a) the
        pass is STILL collapsed after the rescue, and (b) the frames
        actually look noisy (>= AUTO_DENOISE_MIN_NOISE); kept only when
        occluded-marking drops by > AUTO_DENOISE_MIN_DROP. Positions are
        measured on smoothed frames at full resolution, so they map back
        1:1 — no coordinate transform needed.

        retrack: callable(video_like, kwargs) -> (tracks, visible)
        re-running the tracker on a REPLACEMENT video ([T H W] pre-gray
        in uint8 scale accepted by both LK backends).
        noise_sigma: pre-computed estimate (track_chunks' accumulated
        per-chunk device stats); None = estimate from the video here.
        Returns (tracks, visible, engaged).
        """
        if not (
            isinstance(self.matcher, str)  # adaptive policy = 'auto' only
            and self.corr_radius == 0  # user-set corr config wins
            and self._collapse_engage(visible)
        ):
            return tracks, visible, False
        if noise_sigma is None:
            from tdspa.features.matcher import estimate_degradation

            noise_sigma = estimate_degradation(video)["noise_sigma"]
        if noise_sigma < AUTO_DENOISE_MIN_NOISE:
            return tracks, visible, False
        import jax.numpy as jnp

        from tdspa.ops.filters import gaussian_blur_video
        from tdspa.ops.lk import _to_gray

        blurred = gaussian_blur_video(
            _to_gray(jnp.asarray(video)) * 255.0, sigma=AUTO_DENOISE_SIGMA
        )
        d_tracks, d_visible = retrack(blurred, kwargs)
        drop = self._occluded_frac(visible) - self._occluded_frac(d_visible)
        if drop > AUTO_DENOISE_MIN_DROP:
            return d_tracks, d_visible, True
        return tracks, visible, False

    def _maybe_stabilize(self, tracks):
        """Auto-mode escalation gate for strong camera roll.

        Fits the per-frame global similarity from the classical pass's
        own tracks (tdspa/ops/warp.py — consecutive-frame complex
        least-squares written in real pairs, robust, composed) and
        returns the fit when the cumulative rotation exceeds
        STAB_MIN_ANGLE_DEG with credible support, else None. Called
        twice per video at most (two-tier gate): on the pass-1 tracks
        (consecutive-frame fits survive collapse — measured rot_strong
        55 deg / inlier 0.89 pre-rescue) and, only when a rescue
        re-track changed the tracks, on the rescued ones. Rotated templates defeat BOTH the LK window
        match and the matcher's axis-aligned cost patches (measured:
        rot_strong pts-within-2 0.49 classical / 0.53 matcher), so the
        fix is geometric: counter-warp the video into the frame-0
        orientation, re-track there, map positions back through the
        transform. Two host scalar fetches when auto mode is on.
        """
        if not isinstance(self.matcher, str):
            return None
        import jax.numpy as jnp

        from tdspa.ops.warp import fit_similarity_sequence

        fit = fit_similarity_sequence(jnp.asarray(tracks))
        max_angle = float(jnp.max(jnp.abs(fit["angle_deg"])))
        med_inl = float(jnp.median(fit["inlier_frac"][1:]))
        if max_angle < STAB_MIN_ANGLE_DEG or med_inl < STAB_MIN_INLIER:
            return None
        if max_angle > STAB_MAX_ANGLE_DEG:
            # Past the warp's shear-pad budget the stabilized frames corrupt
            # (tdspa/ops/warp.py MAX_WARP_ANGLE_DEG) — keep the classical
            # result rather than replace it with a re-track on bad pixels.
            return None
        return fit

    def _stabilized_result(self, video, fit):
        """Counter-warp to frame-0 orientation, re-track, map back.

        The re-track runs the FULL adaptive policy (rescue + matcher
        auto) on the stabilized luma — residual motion there is small
        and translation-like, exactly the regime the existing stack
        wins on (measured: rot_strong 0.53 -> ~0.9 pts-within-2).
        Visibility is ANDed with an in-bounds test on the MAPPED-BACK
        positions: stabilization extrapolates at canvas borders, so a
        point can be tracked on warped edge padding while its true
        location has left the original frame.
        """
        import jax.numpy as jnp

        from tdspa.ops.lk import _to_gray
        from tdspa.ops.warp import apply_similarity, warp_video_similarity

        h, w = video.shape[1], video.shape[2]
        gray = _to_gray(video) * 255.0  # [T H W] luma, uint8 scale
        pad_h, pad_w = (-h) % 8, (-w) % 8
        if pad_h or pad_w:  # warp needs %8 frames; bottom/right edge pad
            gray = jnp.pad(
                gray, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge"
            )
        stab = warp_video_similarity(gray, fit["A"], fit["t"])
        # Crop back to the original (h, w) before re-tracking: the re-track
        # builds its query grid from the video shape, and a grid built from
        # the padded shape drifts from the canonical make_query_grid(h, w)
        # positions (bottom/right queries could even start past w-1/h-1 and
        # lose visibility for the whole video).
        if pad_h or pad_w:
            stab = stab[:, :h, :w]
        out = self.__call__(stab, _allow_stabilize=False)
        mapped = apply_similarity(
            fit["A"], fit["t"], jnp.asarray(out["tracks"])
        )
        in_bounds = (
            (mapped[..., 0] >= 0)
            & (mapped[..., 0] <= w - 1)
            & (mapped[..., 1] >= 0)
            & (mapped[..., 1] <= h - 1)
        )
        vis = jnp.asarray(out["visible"]) * in_bounds[..., None]
        if isinstance(out["tracks"], np.ndarray):
            return {
                "tracks": np.asarray(mapped, np.float32),
                "visible": np.asarray(vis, np.float32),
            }
        return {"tracks": mapped, "visible": vis}

    def _apply_matcher(self, video, tracks, params,
                       template_frame=None, template_pos=None,
                       refine_first=False, backend="auto"):
        """Learned-matcher post-pass: refined positions + learned visibility.
        The matcher's appearance model REPLACES the LK FB/NCC visibility
        (its learned classifier is strictly better on the regimes where it
        engages — see tdspa/features/matcher.py). Geometry stays exact: the
        learned logit is ANDed with an in-bounds test on the refined
        positions, because cost patches clamp at feature-map borders and the
        appearance head can otherwise re-mark a point that exited the frame
        as visible (same bound as the LK tracker, tdspa/ops/lk.py)."""
        import jax.numpy as jnp

        from tdspa.features.matcher import refine_tracks

        pos, vis_logit = refine_tracks(
            params, video, tracks, template_frame=template_frame,
            template_pos=template_pos, refine_first=refine_first,
            backend=backend,
        )
        h, w = video.shape[1], video.shape[2]
        in_bounds = (
            (pos[..., 0] >= 0)
            & (pos[..., 0] <= w - 1)
            & (pos[..., 1] >= 0)
            & (pos[..., 1] <= h - 1)
        )
        vis = (
            (vis_logit > self.matcher_vis_threshold) & in_bounds
        ).astype(jnp.float32)[..., jnp.newaxis]
        return pos, vis

    def backend_for(self, video_shape) -> str:
        import jax

        if self.device != "auto":
            return self.device
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # The Pallas kernel needs window <= 7 and a frame of at least one
        # full (8, 128) register tile (Mosaic rejects narrower shapes).
        h, w = video_shape[1], video_shape[2]
        if on_tpu and self.window <= 7 and min(h, w) * self.input_scale >= 128:
            return "pallas"
        return "cpu"

    def prefers_device_input(self, video_shape) -> bool:
        """True when the tracker consumes the accelerator-resident video
        (lets the pipeline share its single host->HBM upload)."""
        return self.backend_for(video_shape) == "pallas"

    def __call__(self, video, _allow_stabilize: bool = True) -> dict:
        import contextlib

        import jax

        t, h, w = video.shape[:3]
        queries = make_query_grid(h, w, self.grid_size)
        backend = self.backend_for(video.shape)
        kwargs = dict(
            num_levels=self.num_levels,
            window=self.window,
            iterations=self.iterations,
            fb_threshold=self.fb_threshold,
            ncc_threshold=self.ncc_threshold,
            template_ncc_threshold=self.template_ncc_threshold,
            corr_radius=self.corr_radius,
            corr_iterations=self.corr_iterations,
            corr_accept=self.corr_accept,
            corr_rescue_level=self.corr_rescue_level,
            input_scale=self.input_scale,
        )
        if backend == "pallas":
            from tdspa.kernels.lk import track_video_lk_pallas

            # Stay device-resident: a host round trip of [N T 2]+[N T 1]
            # costs seconds through a dev-tunnel transport and the pipeline
            # consumes these on device anyway.
            tracks, visible = track_video_lk_pallas(video, queries, **kwargs)
            # Two-tier roll gate: consecutive-frame fits survive tracking
            # collapse (inter-frame motion stays small), so gate on the
            # pass-1 tracks FIRST — a confident heavy-roll fit here skips
            # the rescue re-track on the rolled video entirely (its tracks
            # would be discarded; measured pass-1 gate inputs: rot_strong
            # 55 deg / inlier 0.89, clean 1 deg, zoom 0.2 deg). The
            # post-rescue re-gate below keeps the old behavior whenever the
            # pass-1 fit is under-confident but the rescued one is not.
            if _allow_stabilize:
                stab_fit = self._maybe_stabilize(tracks)
                if stab_fit is not None:
                    return self._stabilized_result(video, stab_fit)
            tracks, visible, rescue_drop = self._maybe_rescue(
                lambda kw: track_video_lk_pallas(video, queries, **kw),
                kwargs, tracks, visible,
            )
            if _allow_stabilize and rescue_drop > 0.0:
                stab_fit = self._maybe_stabilize(tracks)
                if stab_fit is not None:
                    return self._stabilized_result(video, stab_fit)
            tracks, visible, denoised = self._maybe_denoise(
                lambda vid, kw: track_video_lk_pallas(vid, queries, **kw),
                video, kwargs, tracks, visible,
            )
            m = self._matcher_for(
                video, lk_visible=visible, rescue_drop=rescue_drop,
                denoised=denoised,
            )
            if m is not None:
                tracks, visible = self._apply_matcher(video, tracks, m)
            return {"tracks": tracks, "visible": visible}
        from tdspa.ops.lk import track_video_lk

        scope = (
            jax.default_device(jax.devices("cpu")[0])
            if backend == "cpu"
            else contextlib.nullcontext()
        )
        with scope:
            tracks, visible = track_video_lk(
                np.asarray(video), queries, **kwargs
            )
            # Two-tier roll gate — same reasoning as the pallas branch.
            if _allow_stabilize:
                stab_fit = self._maybe_stabilize(tracks)
                if stab_fit is not None:
                    return self._stabilized_result(
                        np.asarray(video), stab_fit
                    )
            tracks, visible, rescue_drop = self._maybe_rescue(
                lambda kw: track_video_lk(np.asarray(video), queries, **kw),
                kwargs, tracks, visible,
            )
            if _allow_stabilize and rescue_drop > 0.0:
                stab_fit = self._maybe_stabilize(tracks)
                if stab_fit is not None:
                    return self._stabilized_result(
                        np.asarray(video), stab_fit
                    )
            tracks, visible, denoised = self._maybe_denoise(
                lambda vid, kw: track_video_lk(np.asarray(vid), queries,
                                               **kw),
                video, kwargs, tracks, visible,
            )
            m = self._matcher_for(
                video, lk_visible=visible, rescue_drop=rescue_drop,
                denoised=denoised,
            )
            if m is not None:
                # This branch runs under jax.default_device(cpu) on TPU
                # hosts (small frames / wide windows): force the XLA cost
                # path — refine_tracks' 'auto' keys off the default BACKEND
                # and would dispatch a Mosaic kernel onto the CPU device.
                tracks, visible = self._apply_matcher(
                    video, tracks, m, backend="xla"
                )
        return {
            "tracks": np.asarray(tracks, np.float32),
            "visible": np.asarray(visible, np.float32),
        }

    def track_chunks(self, chunks, interpret: bool = False) -> dict:
        """Track across a consecutive list of device-resident video chunks.

        Chains positions across chunk boundaries by prepending each chunk
        with the previous chunk's final frame (the kernel's frame-0 output is
        the queries themselves and is dropped for continuation chunks), so
        the result is identical to one call on the concatenated video. Lets
        the pipeline overlap host->HBM chunk uploads with tracking compute.
        """
        import jax.numpy as jnp

        from tdspa.kernels.lk import track_video_lk_pallas
        from tdspa.ops.lk import _to_gray

        h, w = chunks[0].shape[1], chunks[0].shape[2]
        kwargs = dict(
            num_levels=self.num_levels,
            window=self.window,
            iterations=self.iterations,
            fb_threshold=self.fb_threshold,
            ncc_threshold=self.ncc_threshold,
            template_ncc_threshold=self.template_ncc_threshold,
            corr_radius=self.corr_radius,
            corr_iterations=self.corr_iterations,
            corr_accept=self.corr_accept,
            corr_rescue_level=self.corr_rescue_level,
            input_scale=self.input_scale,
            interpret=interpret,
        )
        queries = jnp.asarray(make_query_grid(h, w, self.grid_size))
        pos = queries
        vel = jnp.zeros_like(queries)
        # The persistent appearance template is the ORIGINAL first frame at
        # the original query positions for every chunk — identical to the
        # single-call path's template.
        template_frame = _to_gray(chunks[0][:1])[0]
        # The matcher post-pass runs ONCE over the full video AFTER the LK
        # loop (not per chunk): the template-memory bank samples anchor
        # frames across the WHOLE timeline, and auto mode's degradation
        # decision accumulates per-chunk stats (device scalars, NO host
        # fetch inside the loop — a fetch would serialize the
        # upload/compute overlap this method exists for). Auto engages if
        # ANY chunk looks degraded — strictly more sensitive than the
        # single-call path's full-video estimate (a mid-stream degraded
        # segment triggers here), which is the safe direction.
        auto_mode = isinstance(self.matcher, str)
        matcher_params = None if auto_mode else self.matcher
        chunk_stats = []
        prev_last = None
        all_tracks, all_vis = [], []
        for c in chunks:
            seg = (
                c
                if prev_last is None
                else jnp.concatenate([prev_last[jnp.newaxis], c], axis=0)
            )
            tr, vi, vel = track_video_lk_pallas(
                seg, pos, template_frame=template_frame,
                template_pos=queries, init_velocity=vel,
                return_velocity=True, **kwargs,
            )  # [N Ts 2]
            if prev_last is not None:
                tr, vi = tr[:, 1:], vi[:, 1:]
            if auto_mode:
                from tdspa.features.matcher import _degradation_stats

                chunk_stats.append(_degradation_stats(c))  # device scalars
            all_tracks.append(tr)
            all_vis.append(vi)
            pos = tr[:, -1]
            prev_last = c[-1]
        tracks_cat = jnp.concatenate(all_tracks, axis=1)
        vis_cat = jnp.concatenate(all_vis, axis=1)
        # Collapse escalation (auto mode): one whole-video re-track with the
        # rescue config — identical semantics to the single-call path's
        # (frame 0 of the concatenation IS the template frame, and the
        # chunked LK loop equals the single-shot one by construction).
        # Camera-roll escalation: identical two-tier gate + semantics to
        # the single-call path (the re-track runs single-shot on the
        # concatenated stabilized luma — streaming overlap is forfeited
        # only when heavy roll is actually detected). Pre-rescue gate
        # first: a confident fit skips the rescue on the rolled video.
        stab_fit = self._maybe_stabilize(tracks_cat)
        if stab_fit is not None:
            return self._stabilized_result(
                jnp.concatenate(chunks, axis=0), stab_fit
            )
        tracks_cat, vis_cat, rescue_drop = self._maybe_rescue(
            lambda kw: track_video_lk_pallas(
                jnp.concatenate(chunks, axis=0), queries,
                template_frame=template_frame, template_pos=queries, **kw,
            ),
            kwargs, tracks_cat, vis_cat,
        )
        if rescue_drop > 0.0:
            stab_fit = self._maybe_stabilize(tracks_cat)
            if stab_fit is not None:
                return self._stabilized_result(
                    jnp.concatenate(chunks, axis=0), stab_fit
                )
        # Denoise escalation — noise estimate from the already-accumulated
        # per-chunk device stats (max over chunks: a noisy SEGMENT collapses
        # its span of the track timeline). The blurred re-track's template
        # defaults to frame 0 of the blurred concatenation, matching the
        # single-call path on the smoothed video.
        tracks_cat, vis_cat, denoised = self._maybe_denoise(
            lambda vid, kw: track_video_lk_pallas(vid, queries, **kw),
            jnp.concatenate(chunks, axis=0), kwargs, tracks_cat, vis_cat,
            noise_sigma=(
                max(float(s[0]) / 0.37 for s in chunk_stats)
                if chunk_stats else None
            ),
        )
        if chunk_stats and not denoised and (
            self._auto_engage(chunk_stats)
            or (rescue_drop < 0.1 and self._collapse_engage(vis_cat))
        ):
            from tdspa.features.matcher import load_matcher

            if self._auto_matcher_params is None:
                self._auto_matcher_params = load_matcher("default")
            matcher_params = self._auto_matcher_params
        if matcher_params is not None:
            # One pass on the concatenated video == the single-call path
            # exactly (frame 0 of the concatenation IS the template frame).
            tracks_cat, vis_cat = self._apply_matcher(
                jnp.concatenate(chunks, axis=0), tracks_cat, matcher_params
            )
        return {"tracks": tracks_cat, "visible": vis_cat}

    @staticmethod
    def _auto_engage(chunk_stats) -> bool:
        """Engage if ANY chunk's stats cross the auto thresholds (one host
        fetch, after all chunks are queued)."""
        from tdspa.features.matcher import (
            AUTO_FLICKER, AUTO_MIN_CONTRAST, AUTO_NOISE_SIGMA,
        )

        for noise_p30, contrast, flicker in chunk_stats:
            if (
                float(noise_p30) / 0.37 >= AUTO_NOISE_SIGMA
                or float(contrast) < AUTO_MIN_CONTRAST
                or float(flicker) > AUTO_FLICKER
            ):
                return True
        return False

    @staticmethod
    def _occluded_frac(visible) -> float:
        """Marked-occluded fraction of (point, frame) pairs (one scalar
        fetch)."""
        import jax.numpy as jnp

        return 1.0 - float(jnp.mean(jnp.asarray(visible, jnp.float32)))

    @classmethod
    def _collapse_engage(cls, visible) -> bool:
        """True if classical tracking itself collapsed (it marks an
        implausibly large fraction of (point, frame) pairs occluded —
        fast pan does this while every photometric stat reads clean)."""
        from tdspa.features.matcher import AUTO_LK_OCCLUDED_FRAC

        return cls._occluded_frac(visible) > AUTO_LK_OCCLUDED_FRAC


class CoTrackerProvider:
    """The reference's CoTracker3 adapter (requires torch + cotracker)."""

    def __init__(self, grid_size: int = 64, device: str | None = None):
        self.grid_size = grid_size
        self.device = device

    def __call__(self, video: np.ndarray) -> dict:
        try:
            import cotracker  # noqa: F401
            import torch
        except ImportError as e:
            raise RuntimeError(
                "CoTracker3 not available; install from "
                "github.com/facebookresearch/co-tracker or use "
                "PyramidalLKTracker / PrecomputedTrackProvider"
            ) from e

        import cotracker as ct

        device = self.device or ("cuda" if torch.cuda.is_available() else "cpu")
        tracker = ct.CoTracker().to(device).eval()

        video_tensor = (
            torch.from_numpy(video).permute(0, 3, 1, 2).float() / 255.0
        ).unsqueeze(0).to(device)
        t, h, w = video.shape[:3]
        grid_xy = make_query_grid(h, w, self.grid_size)
        # CoTracker queries are (t, y, x).
        queries = np.concatenate(
            [np.zeros((grid_xy.shape[0], 1), np.float32), grid_xy[:, ::-1]], axis=1
        )
        queries_t = torch.from_numpy(queries).unsqueeze(0).to(device)
        with torch.no_grad():
            pred_tracks, pred_visibility = tracker(
                video=video_tensor, queries=queries_t
            )
        tracks = pred_tracks[0].cpu().numpy().astype(np.float32)  # [N T 2] (x,y)
        visible = (
            pred_visibility[0].cpu().numpy()[..., np.newaxis].astype(np.float32)
        )
        logging.info(
            "CoTracker3: %d tracks over %d frames", tracks.shape[0], tracks.shape[1]
        )
        return {"tracks": tracks, "visible": visible}


def extract_2d_tracks(video: np.ndarray, provider=None, grid_size: int = 64) -> dict:
    """Reference-compatible entry (inference.py:97): CoTracker if importable,
    else the JAX LK tracker."""
    if provider is None:
        try:
            import cotracker  # noqa: F401

            provider = CoTrackerProvider(grid_size=grid_size)
        except ImportError:
            logging.info("cotracker not installed; using JAX pyramidal-LK tracker")
            provider = PyramidalLKTracker(grid_size=grid_size)
    return provider(video)
