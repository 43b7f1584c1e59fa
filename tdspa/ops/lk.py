"""Pyramidal Lucas-Kanade point tracking in pure JAX.

A TPU-resident 2D point tracker used as the self-contained fallback for the
CoTracker3 front-end (the reference hard-depends on a torch/CUDA package for
tracking, inference.py:97-154; this keeps the end-to-end pipeline runnable on
a TPU-only host). Classic coarse-to-fine LK with iterative refinement and
forward-backward visibility checking:

* grayscale pyramid (2x2 average pooling per level);
* per level, Gauss-Newton on the brightness-constancy residual over a
  window around each point (all points solved in parallel — the normal
  matrix is 2x2, inverted in closed form);
* frame-to-frame chaining via ``lax.scan``;
* visibility = forward-backward error < threshold AND in-bounds AND a
  well-conditioned normal matrix AND (occlusion reasoning) window NCC
  between the tracked patch in consecutive frames above ``ncc_threshold`` —
  an occluder sweeping over a point changes the local appearance abruptly,
  which FB-checking alone misses when the occluder is itself trackable.

Everything is static-shape and fully batched over points: windows gather via
vectorized bilinear interpolation, so the tracker compiles to dense
gather+FMA XLA ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _to_gray(video):  # [T H W 3] (or pre-gray [T H W]) -> [T H W] f32 in [0,1]
    v = jnp.asarray(video, jnp.float32) / 255.0
    if v.ndim == 3:  # already luma (e.g. the stabilized re-track path)
        return v
    return v[..., 0] * 0.299 + v[..., 1] * 0.587 + v[..., 2] * 0.114


def _downsample2(img):  # [T H W] -> [T H/2 W/2], 2x2 mean
    t, h, w = img.shape
    return img[:, : h // 2 * 2, : w // 2 * 2].reshape(
        t, h // 2, 2, w // 2, 2
    ).mean(axis=(2, 4))


def _bilinear(img, coords):
    """img [H W], coords [... 2] (x, y) -> values [...], edge-clamped."""
    h, w = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    return (
        img[y0, x0] * (1 - wx) * (1 - wy)
        + img[y0, x1] * wx * (1 - wy)
        + img[y1, x0] * (1 - wx) * wy
        + img[y1, x1] * wx * wy
    )


def _window_offsets(window: int):
    r = (window - 1) / 2.0
    ax = jnp.arange(window) - r
    ox, oy = jnp.meshgrid(ax, ax)
    return jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # [K 2]


def _lk_level(i0, i1, pts, disp, window: int, iterations: int):
    """One pyramid level of Gauss-Newton LK.

    i0/i1: [H W] template/target; pts: [N 2] template positions at this
    level's scale; disp: [N 2] current displacement estimate (this scale).
    Returns (disp, min_eig) — min_eig of the normal matrix for conditioning.
    """
    offs = _window_offsets(window)  # [K 2]
    coords0 = pts[:, None, :] + offs[None]  # [N K 2]

    # Template patch + gradients (central differences via shifted samples).
    t_patch = _bilinear(i0, coords0)
    half = jnp.asarray([0.5, 0.0])
    ix = _bilinear(i0, coords0 + half) - _bilinear(i0, coords0 - half)
    iy = _bilinear(i0, coords0 + half[::-1]) - _bilinear(i0, coords0 - half[::-1])

    gxx = jnp.sum(ix * ix, axis=-1)
    gxy = jnp.sum(ix * iy, axis=-1)
    gyy = jnp.sum(iy * iy, axis=-1)
    det = gxx * gyy - gxy * gxy
    trace = gxx + gyy
    min_eig = (trace - jnp.sqrt(jnp.maximum(trace**2 - 4 * det, 0.0))) / 2.0
    inv_det = jnp.where(jnp.abs(det) > 1e-8, 1.0 / det, 0.0)

    def body(_, disp):
        patch1 = _bilinear(i1, coords0 + disp[:, None, :])
        resid = patch1 - t_patch
        bx = jnp.sum(resid * ix, axis=-1)
        by = jnp.sum(resid * iy, axis=-1)
        dx = inv_det * (gyy * bx - gxy * by)
        dy = inv_det * (-gxy * bx + gxx * by)
        return disp - jnp.stack([dx, dy], axis=-1)

    disp = jax.lax.fori_loop(0, iterations, body, disp)
    return disp, min_eig


def _gauss_weights(window: int):
    """[K] center-emphasizing weights (sigma = window/4, sum = 1).

    The occlusion contract is "the POINT is covered": a flat window NCC
    stays high while an occluder boundary clips only the window's edge, so
    edge-grazing occlusions leak through. Center weighting makes the center
    pixels dominate the correlation statistics.
    """
    offs = _window_offsets(window)  # [K 2] centered
    sigma = window / 4.0
    w = jnp.exp(-jnp.sum(offs * offs, -1) / (2.0 * sigma * sigma))
    return w / jnp.sum(w)


def _weighted_ncc(a, b, w):
    """Center-weighted NCC of patch rows a, b [..., K] with weights w [K]."""
    am = a - jnp.sum(a * w, -1, keepdims=True)
    bm = b - jnp.sum(b * w, -1, keepdims=True)
    cov = jnp.sum(w * am * bm, -1)
    var = jnp.sum(w * am * am, -1) * jnp.sum(w * bm * bm, -1)
    return cov / (jnp.sqrt(var) + 1e-6)


def _window_ncc(i0, i1, pts0, pts1, window: int):
    """Center-weighted NCC of the [window x window] patches at pts0 in i0
    and pts1 in i1. Returns [N] in [-1, 1]."""
    offs = _window_offsets(window)  # [K 2]
    a = _bilinear(i0, pts0[:, None, :] + offs[None])  # [N K]
    b = _bilinear(i1, pts1[:, None, :] + offs[None])
    return _weighted_ncc(a, b, _gauss_weights(window))


def _corr_refine(template_raw, i1, pts1, window: int, radius: int):
    """Local cost-volume matching (RAFT/CoTracker-style discrete lookup).

    LK's Gauss-Newton descends the brightness-constancy residual frame to
    frame — errors compound as drift and the tracker never recovers a point
    it lost. This pass evaluates the center-weighted NCC of the PERSISTENT
    frame-0 template (``template_raw`` [N K]) against every integer offset
    in a ``(2*radius+1)^2`` search grid around the current estimate
    (``pts1`` in ``i1``) — one [K, K] correlation tile per point, batched
    over all points — and returns the peak. Center weighting (same
    ``_gauss_weights`` as the visibility checks) keeps the matched POINT in
    charge of the score, not the window edges.

    Returns (snapped_pts [N 2], peak_ncc [N]). Matching the ORIGINAL
    appearance makes this a drift-free re-localizer: callers accept the
    snap only when the peak is strong AND materially better than the
    current estimate's own score (re-scored via the same template NCC at
    the fractional estimate — ``template_score`` at the call sites) — a
    weak peak means the original appearance is absent (occlusion /
    appearance change), and a peak no better than the estimate means LK
    already converged (snapping would only add integer-grid bias).
    """
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dx, dy = jnp.meshgrid(d, d)
    cand = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # [C 2]
    # floor(x + 0.5) == round-half-up, matching the Pallas kernel (jnp.round
    # rounds half to even, which diverges at exact .5 positions).
    centers = jnp.floor(pts1 + 0.5)[:, None, :] + cand[None]  # [N C 2]
    offs = _window_offsets(window)
    patches = _bilinear(
        i1, centers[:, :, None, :] + offs[None, None]
    )  # [N C K]
    ncc = _weighted_ncc(
        template_raw[:, None, :], patches, _gauss_weights(window)
    )  # [N C]

    best = jnp.argmax(ncc, axis=-1)  # [N]
    peak = jnp.take_along_axis(ncc, best[:, None], axis=-1)[:, 0]
    snapped = jnp.take_along_axis(
        centers, best[:, None, None], axis=1
    )[:, 0]
    return snapped, peak


def _track_pair(pyr0, pyr1, pts, window: int, iterations: int,
                init_disp=None):
    """Track pts [N 2] from frame pyramid pyr0 to pyr1 (lists, fine->coarse).

    ``init_disp``: optional [N 2] full-resolution displacement prior seeding
    the coarsest level (e.g. the previous frame pair's displacement — a
    constant-velocity prior moves fast steady motion back inside LK's
    pull-in range).

    Returns (new_pts, min_eig at the finest level).
    """
    num_levels = len(pyr0)
    coarse_scale = 2.0 ** (num_levels - 1)
    disp = (
        jnp.zeros_like(pts) if init_disp is None else init_disp / coarse_scale
    )
    min_eig = jnp.zeros(pts.shape[0])
    for lvl in reversed(range(num_levels)):
        scale = 2.0**lvl
        disp, min_eig = _lk_level(
            pyr0[lvl], pyr1[lvl], pts / scale, disp, window, iterations
        )
        if lvl > 0:
            disp = disp * 2.0  # upsample displacement to the next-finer level
    return pts + disp, min_eig


def build_pyramid(gray, num_levels: int):
    pyr = [gray]
    for _ in range(num_levels - 1):
        pyr.append(_downsample2(pyr[-1]))
    return pyr


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_levels", "window", "iterations", "fb_threshold", "ncc_threshold",
        "template_ncc_threshold", "corr_radius", "corr_iterations",
        "corr_rescue_level",
    ),
)
def _track_all(gray, queries, num_levels, window, iterations, fb_threshold,
               ncc_threshold, template_ncc_threshold, corr_radius=0,
               corr_iterations=2, corr_accept=0.85, corr_rescue_level=0):
    t, h, w = gray.shape
    pyramids = build_pyramid(gray, num_levels)  # list of [T h w]
    offs = _window_offsets(window)
    gauss_w = _gauss_weights(window)
    template_raw = _bilinear(
        pyramids[0][0], queries[:, None, :] + offs[None]
    )  # [N K] — frame-0 appearance, shared by the template-NCC visibility
    #            check and the cost-volume re-localizer
    rescue_lvl = min(corr_rescue_level, num_levels - 1)
    if corr_radius > 0 and rescue_lvl > 0:
        rescue_scale = 2.0 ** rescue_lvl
        template_raw_c = _bilinear(
            pyramids[rescue_lvl][0],
            queries[:, None, :] / rescue_scale + offs[None],
        )  # [N K] frame-0 appearance at the rescue level

    def step(carry, idx):
        pts, vel = carry
        p0 = [lvl[idx] for lvl in pyramids]
        p1 = [lvl[idx + 1] for lvl in pyramids]
        # Constant-velocity prior: seed this pair's LK with the previous
        # pair's displacement — after ONE successful (re-)localization,
        # fast steady motion is back inside the pull-in range every frame.
        new_pts, min_eig = _track_pair(
            p0, p1, pts, window, iterations, init_disp=vel
        )
        if corr_radius > 0:
            # Drift-free re-localization: cost-volume snaps (fine level,
            # plus the rescue level when enabled — its +-radius grid spans
            # ``radius * 2^lvl`` full-res pixels, far past LK's pull-in
            # range) are GN-polished at the finest level, then EVERY
            # candidate is verified by the fine frame-0 template's
            # center-weighted NCC at its polished position. The verified
            # argmax wins, and it must beat the LK estimate's own score by
            # a clear margin: un-drifted tracks are left alone (no
            # integer-snap bias), weak matches everywhere mean the
            # original appearance is absent (occlusion/appearance change)
            # and the LK estimate + NCC visibility checks stay in charge.
            # Verification at the FINE level is what kills cost-volume
            # false positives on self-similar texture — an integer peak is
            # cheap to fake, a polished sub-pixel fine-template match is
            # not.
            def template_score(p):
                patch = _bilinear(p1[0], p[:, None, :] + offs[None])
                return _weighted_ncc(template_raw, patch, gauss_w)

            snapped, _ = _corr_refine(
                template_raw, p1[0], new_pts, window, corr_radius
            )
            disp, _ = _lk_level(
                p0[0], p1[0], pts, snapped - pts, window, corr_iterations
            )
            candidates = [pts + disp]
            if rescue_lvl > 0:
                snap_c, _ = _corr_refine(
                    template_raw_c, p1[rescue_lvl], new_pts / rescue_scale,
                    window, corr_radius,
                )
                disp_c, _ = _lk_level(
                    p0[0], p1[0], pts, snap_c * rescue_scale - pts,
                    window, corr_iterations,
                )
                candidates.append(pts + disp_c)

            score_lk = template_score(new_pts)
            best_pts, best_score = new_pts, score_lk
            for cand in candidates:
                s = template_score(cand)
                better = (s > best_score)[:, None]
                best_pts = jnp.where(better, cand, best_pts)
                best_score = jnp.maximum(best_score, s)
            accept = (
                (best_score > corr_accept) & (best_score > score_lk + 0.1)
            )[:, None]
            new_pts = jnp.where(accept, best_pts, new_pts)
        in_bounds = (
            (new_pts[:, 0] >= 0)
            & (new_pts[:, 0] <= w - 1)
            & (new_pts[:, 1] >= 0)
            & (new_pts[:, 1] <= h - 1)
        )
        visible = in_bounds & (min_eig > 1e-6)
        if fb_threshold > -1.0:
            # The backward pass doubles tracking cost; with the NCC checks on
            # it buys ~1% occlusion recall on the synthetic benchmark
            # (tests/unit/test_tracking_quality.py), so fb_threshold <= -1
            # skips it entirely (the pipeline's fast configuration).
            # Backward seeds from the negated forward displacement (the
            # velocity prior's mirror) so FB stays meaningful on fast motion.
            back_pts, _ = _track_pair(
                p1, p0, new_pts, window, iterations, init_disp=pts - new_pts
            )
            fb_err = jnp.linalg.norm(back_pts - pts, axis=-1)
            visible &= fb_err < fb_threshold
        if ncc_threshold > -1.0:
            ncc = _window_ncc(p0[0], p1[0], pts, new_pts, window)
            visible &= ncc > ncc_threshold
        if template_ncc_threshold > -1.0:
            # Persistent appearance check vs the frame-0 template: an
            # occluder that sweeps over a point and then tracks consistently
            # passes both FB and step-NCC checks; only the original
            # appearance identifies the point as lost for the whole
            # occlusion, not just its onset frame.
            patch = _bilinear(p1[0], new_pts[:, None, :] + offs[None])
            t_ncc = _weighted_ncc(template_raw, patch, gauss_w)
            visible &= t_ncc > template_ncc_threshold
        clamped = jnp.stack(
            [jnp.clip(new_pts[:, 0], 0, w - 1), jnp.clip(new_pts[:, 1], 0, h - 1)],
            axis=-1,
        )
        # Velocity carry, clipped so a garbage displacement (lost track)
        # cannot fling the next frame's search arbitrarily far.
        new_vel = jnp.clip(clamped - pts, -32.0, 32.0)
        return (clamped, new_vel), (clamped, visible)

    init = (queries, jnp.zeros_like(queries))
    _, (traj, vis) = jax.lax.scan(step, init, jnp.arange(t - 1))
    # Prepend frame 0 (queries, all visible).
    tracks = jnp.concatenate([queries[None], traj], axis=0)  # [T N 2]
    visible = jnp.concatenate(
        [jnp.ones((1, queries.shape[0]), bool), vis], axis=0
    )
    return jnp.transpose(tracks, (1, 0, 2)), jnp.transpose(visible, (1, 0))


def track_video_lk(
    video,
    queries,  # [N 2] (x, y) positions at frame 0
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
    input_scale: float = 1.0,
):
    """Track query points through a video.

    ``ncc_threshold``: consecutive-frame window-NCC below this marks the
    point occluded. ``template_ncc_threshold``: same against the frame-0
    query-position template (persistent-occlusion detection; looser default
    since appearance drifts over time). Either <= -1 disables that check.
    ``corr_radius``: drift-free re-localization after LK — snap to the
    frame-0 template's NCC peak within this integer radius (then
    ``corr_iterations`` of sub-pixel Gauss-Newton), accepted only where the
    peak exceeds ``corr_accept`` (<= 0 radius disables; see
    ``_corr_refine``). ``corr_rescue_level``: additionally search the
    same radius at this pyramid level (covering ``radius * 2^lvl`` full-res
    pixels) for points the fine cost volume could not place — fast-motion
    recovery far past LK's pull-in range (0 disables).

    ``input_scale=0.5`` tracks on the half-resolution luma (serving knob —
    see tdspa/kernels/lk.py::track_video_lk_pallas for semantics); all
    coordinates in and out stay in full-resolution pixels.

    Returns (tracks [N T 2] float32, visible [N T 1] float32).
    """
    if input_scale not in (1.0, 0.5):
        raise ValueError(f"input_scale must be 1.0 or 0.5, got {input_scale}")
    gray = _to_gray(jnp.asarray(video))
    queries = jnp.asarray(queries, jnp.float32)
    if input_scale == 0.5:
        gray = _downsample2(gray)
        queries = (queries - 0.5) * 0.5
        fb_threshold = float(fb_threshold) * 0.5
    tracks, visible = _track_all(
        gray,
        jnp.asarray(queries, jnp.float32),
        num_levels,
        window,
        iterations,
        float(fb_threshold),
        float(ncc_threshold),
        float(template_ncc_threshold),
        int(corr_radius),
        int(corr_iterations),
        float(corr_accept),
        int(corr_rescue_level),
    )
    if input_scale == 0.5:
        tracks = tracks * 2.0 + 0.5
    return tracks, visible[..., None].astype(jnp.float32)
