"""Pallas TPU kernel: pyramidal Lucas-Kanade point tracking.

XLA lowers the LK tracker's per-point window sampling to gathers, which TPUs
execute catastrophically slowly (~7 s/frame-pair at 4096 points on v5e vs
0.35 s on a host core — see tdspa/features/tracks.py). This kernel replaces
every gather with *dynamic window slices*: each bilinear window sample is a
weighted sum of four statically-shaped ``pl.ds`` reads straight from the
VMEM-resident frame — zero gathers anywhere.

Structure:
* pallas grid = frame pairs. TPU grids execute sequentially, so the tracked
  positions live in a VMEM scratch buffer carried across grid steps
  (initialized from the queries at step 0).
* per grid step, both frames of every pyramid level are staged into VMEM by
  the block machinery (the same pyramid array appears once per side with
  frame-index maps t and t+1).
* points process in GROUPS OF 8, fully vectorized: the 8 points' 16-row
  window strips stack into ONE [128, W] tile (8 strips x 16 sublanes), and
  all window arithmetic — bilinear combination, gradients, masking, the
  Gauss-Newton normal equations and updates — runs once per group on stacked
  tiles instead of once per point. Only the address-dependent work (strip
  load + row/column alignment rolls) remains per-point; per-strip reductions
  and weight broadcasts go through tiny constant 0/1 matmuls ([8,128] /
  [128,8] selectors), and the GN solver state is [8,1] vector tiles. This
  removed ~8x of instruction-issue overhead vs the round-1 per-point kernel
  (measured 15.8 s -> see docs/BENCHMARKS.md) with identical math.

The math matches tdspa/ops/lk.py (the test oracle) up to edge behavior:
windows clipping the frame border shift inward rather than clamping per
pixel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_mask(window: int, width: int):
    """[128, W] mask: rows (i % 16) < window and cols < window.

    Selects the valid [window, window] block of every one of the 8 stacked
    16-row strips.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, width), 0) % 16
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, width), 1)
    return ((rows < window) & (cols < window)).astype(jnp.float32)


def _gauss_weight_tile(window: int, width: int):
    """[128, W] per-strip Gaussian center weights (ops/lk._gauss_weights
    laid out on the stacked-strip tile), normalized to sum 1 per window."""
    r = (window - 1) / 2.0
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (128, width), 0) % 16
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (128, width), 1
    ).astype(jnp.float32)
    sigma = window / 4.0
    w = jnp.exp(
        -((rows - r) ** 2 + (cols - r) ** 2) / (2.0 * sigma * sigma)
    ) * _window_mask(window, width)
    return w / jnp.sum(w[0:16, :])


def _expand_matrix():
    """[128, 8] constant: E[i, j] = 1 if i // 16 == j (strip expansion)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 0) // 16
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1)
    return (rows == cols).astype(jnp.float32)


def _select_matrix():
    """[8, 128] constant: S[j, i] = 1 if i // 16 == j (strip selection)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) // 16
    return (rows == cols).astype(jnp.float32)


def _expand8(vec8, expand):
    """[8, 1] -> [128, 1], repeating each value over its 16-row strip.

    A standard (no implicit transpose) matmul against the constant 0/1
    expansion matrix — Mosaic's MXU transforms reject transposed-operand
    contractions here.
    """
    return jax.lax.dot_general(
        expand, vec8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _strip_sums(arr, select):
    """[128, W] -> [8, 1]: sum of each 16-row strip."""
    row_sums = jnp.sum(arr, axis=1, keepdims=True)  # [128, 1]
    return jax.lax.dot_general(
        select, row_sums, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, 1]


def _load_strips(img_ref, col, row, span: int, height: int, width: int,
                 narrow: bool):
    """Stack 8 16-row strips with each point's block aligned to (0, 0).

    col/row: [8, 1] int32 desired top-left corners; clamped so a ``span``-
    sized block stays in frame. Returns (stacked [128, W'], clamped col
    [8, 1], clamped row [8, 1]). Mosaic alignment rules shape this: sublane
    dynamic slices must be 8-aligned (aligned 16-row strip + dynamic roll),
    lane offsets cannot be dynamically sliced (dynamic roll), and
    ``narrow`` slices each strip to its first 128 lanes after alignment.
    """
    # A 16-row strip only guarantees 16 - 7 = 9 valid rows after the
    # 8-alignment roll (offset rj - row_base <= 7): for span > 9 the
    # cyclic roll would WRAP rows from above the block into its bottom
    # (silently corrupting e.g. the corr-refine cost volume at span 14).
    # Stage 24 rows and statically slice the aligned first 16 instead —
    # same pattern as kernels/matcher.py, valid for span <= 16.
    deep = span > 9
    if deep and height < 24:
        raise ValueError(
            f"span {span} > 9 needs 24-row strip staging but height is "
            f"only {height}"
        )
    strips, cols, rows = [], [], []
    for j in range(8):
        cj = jnp.clip(col[j, 0], 0, width - span)
        rj = jnp.clip(row[j, 0], 0, height - span)
        if deep:
            row_base = pl.multiple_of(
                jnp.clip((rj // 8) * 8, 0, height - 24), 8
            )
            strip = img_ref[pl.ds(row_base, 24), :]  # [24, W]
            strip = pltpu.roll(strip, (24 - (rj - row_base)) % 24, axis=0)
            strip = strip[:16]
        else:
            row_base = pl.multiple_of(
                jnp.clip((rj // 8) * 8, 0, height - 16), 8
            )
            strip = img_ref[pl.ds(row_base, 16), :]  # [16, W]
            # pltpu.roll requires non-negative shifts: left-roll by k ==
            # right-roll by (size - k).
            strip = pltpu.roll(strip, (16 - (rj - row_base)) % 16, axis=0)
        strip = pltpu.roll(strip, (width - cj) % width, axis=1)
        if narrow:
            strip = strip[:, :128]
        strips.append(strip)
        cols.append(cj.reshape(1, 1))
        rows.append(rj.reshape(1, 1))
    return (
        jnp.concatenate(strips, axis=0),  # [128, W']
        jnp.concatenate(cols, axis=0).astype(jnp.float32),  # [8, 1]
        jnp.concatenate(rows, axis=0).astype(jnp.float32),
    )


def _sample_group(img_ref, u, v, window: int, height: int, width: int,
                  narrow: bool):
    """[128, W'] stacked bilinear window samples for 8 points.

    u/v: [8, 1] f32 positions. Strip j (rows 16j..16j+15) holds point j's
    window in its top-left [window, window] block. All of a point's samples
    share one fractional part, so the window equals a weighted sum of four
    one-pixel-shifted views. Mosaic alignment rules shape the implementation:
    sublane (row) dynamic slices must be 8-aligned (aligned 16-row strip +
    dynamic roll), lane (column) offsets cannot be dynamically sliced at all
    (dynamic roll instead), and registers only support aligned static slices
    (the shifted views come from whole-tile static rolls; consumers mask the
    valid [w, w] block via ``_window_mask``). With ``narrow``, strips slice
    to their first 128 lanes after alignment (the window needs only
    ``window + 1`` columns), shrinking all stacked arithmetic 4x at W=512.
    """
    r = (window - 1) // 2
    stacked, _, _ = _load_strips(
        img_ref,
        jnp.floor(u).astype(jnp.int32) - r,
        jnp.floor(v).astype(jnp.int32) - r,
        window + 1, height, width, narrow,
    )
    w_eff = stacked.shape[1]

    expand = _expand_matrix()
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    wx = _expand8(u - iu, expand)  # [128, 1]
    wy = _expand8(v - iv, expand)
    # Static one-pixel shifts of all 8 windows at once. A whole-tile axis-0
    # roll by -1 crosses strip boundaries only at each strip's row 15, which
    # lies outside every (window <= 7)-row mask.
    s01 = pltpu.roll(stacked, w_eff - 1, axis=1)
    s10 = pltpu.roll(stacked, 127, axis=0)
    s11 = pltpu.roll(s01, 127, axis=0)
    return (
        stacked * (1 - wx) * (1 - wy)
        + s01 * wx * (1 - wy)
        + s10 * (1 - wx) * wy
        + s11 * wx * wy
    )


def _track_group_one_dir(i0_refs, i1_refs, shapes, masks, xy, window,
                         iterations, narrow, init_disp=None):
    """Coarse-to-fine LK for a group of 8 points, fully stacked.

    xy: [8, 2] start positions; ``init_disp``: optional [8, 2] full-res
    displacement prior seeding the coarsest level (constant-velocity
    prior — oracle ``ops/lk._track_pair``). Returns (new_xy [8, 2],
    min_eig [8, 1]).
    """
    num_levels = len(i0_refs)
    select = _select_matrix()
    x = xy[:, 0:1]  # [8, 1]
    y = xy[:, 1:2]
    if init_disp is None:
        dx = jnp.zeros((8, 1), jnp.float32)
        dy = jnp.zeros((8, 1), jnp.float32)
    else:
        coarse = 2.0 ** (num_levels - 1)
        dx = init_disp[:, 0:1] / coarse
        dy = init_disp[:, 1:2] / coarse
    min_eig = jnp.zeros((8, 1), jnp.float32)

    for lvl in reversed(range(num_levels)):
        scale = 2.0**lvl
        height, width = shapes[lvl]
        mask = masks[lvl]  # [128, W'] valid-window mask
        px = x / scale
        py = y / scale

        samp0 = functools.partial(
            _sample_group, i0_refs[lvl], window=window,
            height=height, width=width, narrow=narrow,
        )
        t_win = samp0(px, py)
        ix = (samp0(px + 0.5, py) - samp0(px - 0.5, py)) * mask
        iy = (samp0(px, py + 0.5) - samp0(px, py - 0.5)) * mask

        gxx = _strip_sums(ix * ix, select)  # [8, 1]
        gxy = _strip_sums(ix * iy, select)
        gyy = _strip_sums(iy * iy, select)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (trace - jnp.sqrt(jnp.maximum(trace**2 - 4 * det, 0.0))) / 2.0
        inv_det = jnp.where(jnp.abs(det) > 1e-8, 1.0 / det, 0.0)

        samp1 = functools.partial(
            _sample_group, i1_refs[lvl], window=window,
            height=height, width=width, narrow=narrow,
        )

        def iter_body(_, carry, _samp1=samp1, _t=t_win, _ix=ix, _iy=iy,
                      _inv=inv_det, _gxx=gxx, _gxy=gxy, _gyy=gyy,
                      _px=px, _py=py, _select=select):
            cdx, cdy = carry
            p_win = _samp1(_px + cdx, _py + cdy)
            resid = p_win - _t  # garbage outside the window; ix/iy are masked
            bxv = _strip_sums(resid * _ix, _select)  # [8, 1]
            byv = _strip_sums(resid * _iy, _select)
            cdx = cdx - _inv * (_gyy * bxv - _gxy * byv)
            cdy = cdy - _inv * (-_gxy * bxv + _gxx * byv)
            return cdx, cdy

        dx, dy = jax.lax.fori_loop(0, iterations, iter_body, (dx, dy))
        if lvl > 0:
            dx = dx * 2.0
            dy = dy * 2.0
    return jnp.concatenate([x + dx, y + dy], axis=1), min_eig


def _corr_refine_group(tmpl_ref, i1_ref, tq, est, window: int, radius: int,
                       height: int, width: int, narrow: bool):
    """Cost-volume re-localization for 8 points (oracle: ops/lk.py
    ``_corr_refine``).

    tq: [8, 2] PERSISTENT template positions (frame 0 / tmpl_ref); est:
    [8, 2] LK estimates (frame t+1). Evaluates the NCC of the frame-0
    template window against every integer offset in a (2*radius+1)^2 grid
    around round(est) — the whole cost volume materializes on the stacked
    strips via static-shift accumulation (VPU tiles, zero gathers) — and
    returns (snapped [8, 2], peak_ncc [8, 1]). The NCC is center-weighted
    (oracle ``ops/lk._weighted_ncc`` with ``_gauss_weights``): the Gaussian
    is separable, so the weighted window sums keep the same static-roll
    structure with scalar per-shift weights. Callers re-score acceptance
    via the fine template NCC at the fractional candidates
    (``template_score``), not the returns.
    """
    k = 2 * radius + 1
    r = (window - 1) // 2
    span = k + window - 1  # union of all candidate windows (<= 15 for
    #                        window 7 / radius 4: fits one 16-row strip)
    select = _select_matrix()
    expand = _expand_matrix()

    # Separable per-axis Gaussian taps: w2d(dy, dx) = g[dy] * g[dx], summing
    # to 1 over the window (matches ops/lk._gauss_weights exactly).
    sigma = window / 4.0
    g = [math.exp(-((d - r) ** 2) / (2.0 * sigma * sigma))
         for d in range(window)]
    g = [x / sum(g) for x in g]

    # Frame-0 template window (bilinear, fractional) at tq, weighted-
    # centered: that = t - sum(w * t).
    t_raw = _sample_group(tmpl_ref, tq[:, 0:1], tq[:, 1:2], window=window,
                          height=height, width=width, narrow=narrow)
    w_eff = t_raw.shape[1]
    mask_w = _window_mask(window, w_eff)
    wt = _gauss_weight_tile(window, w_eff)
    t_raw = t_raw * mask_w
    that = (t_raw - _expand8(_strip_sums(t_raw * wt, select), expand)) * mask_w
    tvar = _strip_sums(that * that * wt, select)  # [8, 1] sum(w * that^2)

    # Union patch at integer base round(est) - radius - r (clamped).
    ex = jnp.floor(est[:, 0:1] + 0.5).astype(jnp.int32)  # round half-up
    ey = jnp.floor(est[:, 1:2] + 0.5).astype(jnp.int32)
    patch, col, row = _load_strips(
        i1_ref, ex - (radius + r), ey - (radius + r), span,
        height, width, narrow,
    )  # [128, W'], clamped bases [8, 1]

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (128, w_eff), 0) % 16
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (128, w_eff), 1)

    # Weighted cross term C[y, x] = sum_{dy, dx} w2d * P[y+dy, x+dx] *
    # that[dy, dx] (== cov(p, t) since sum(w * that) = 0) via 49 static
    # shifted FMAs; that elements extract per strip through 0/1 masks.
    corr = jnp.zeros_like(patch)
    for dy in range(window):
        for dx in range(window):
            m = ((rows_iota == dy) & (cols_iota == dx)).astype(jnp.float32)
            tval = _strip_sums(that * m, select) * (g[dy] * g[dx])  # [8, 1]
            shifted = pltpu.roll(patch, (128 - dy) % 128, axis=0)
            shifted = pltpu.roll(shifted, (w_eff - dx) % w_eff, axis=1)
            corr = corr + shifted * _expand8(tval, expand)

    # Weighted candidate-window moments via separable weighted sums (the
    # Gaussian factorizes, so the roll structure is unchanged).
    def wbox(arr):
        acc_r = arr * g[0]
        for dx in range(1, window):
            acc_r = acc_r + pltpu.roll(arr, w_eff - dx, axis=1) * g[dx]
        acc = acc_r * g[0]
        for dy in range(1, window):
            acc = acc + pltpu.roll(acc_r, 128 - dy, axis=0) * g[dy]
        return acc

    e1 = wbox(patch)          # sum(w * p)
    e2 = wbox(patch * patch)  # sum(w * p^2)
    var_p = jnp.maximum(e2 - e1 * e1, 0.0)  # sum(w * (p - mean_w)^2)
    # Oracle eps placement: cov / (sqrt(var_p * var_t) + 1e-6).
    ncc = corr / (jnp.sqrt(var_p * _expand8(tvar, expand)) + 1e-6)

    valid = (rows_iota < k) & (cols_iota < k)
    ncc = jnp.where(valid, ncc, -2.0)

    # Per-strip argmax: strip max via aligned static slices, index via
    # equality masks (float ties are measure-zero).
    maxes = []
    for j in range(8):
        block = ncc[16 * j : 16 * (j + 1), :]
        maxes.append(jnp.max(jnp.max(block, axis=0, keepdims=True),
                             axis=1, keepdims=True))
    peak = jnp.concatenate(maxes, axis=0)  # [8, 1]
    eq = ((ncc == _expand8(peak, expand)) & valid).astype(jnp.float32)
    count = _strip_sums(eq, select)
    ox = _strip_sums(eq * cols_iota.astype(jnp.float32), select) / count
    oy = _strip_sums(eq * rows_iota.astype(jnp.float32), select) / count

    # Tile position (oy, ox) = image position (row + oy + r, col + ox + r).
    snapped = jnp.concatenate([col + ox + r, row + oy + r], axis=1)  # [8, 2]
    return snapped, peak


def _gn_polish_group(i0_ref, i1_ref, grp, start, window: int,
                     iterations: int, height: int, width: int, narrow: bool,
                     mask):
    """Finest-level Gauss-Newton from ``start`` (sub-pixel polish after the
    integer cost-volume snap). Returns [8, 2]."""
    select = _select_matrix()
    px = grp[:, 0:1]
    py = grp[:, 1:2]
    samp0 = functools.partial(_sample_group, i0_ref, window=window,
                              height=height, width=width, narrow=narrow)
    t_win = samp0(px, py)
    ix = (samp0(px + 0.5, py) - samp0(px - 0.5, py)) * mask
    iy = (samp0(px, py + 0.5) - samp0(px, py - 0.5)) * mask
    gxx = _strip_sums(ix * ix, select)
    gxy = _strip_sums(ix * iy, select)
    gyy = _strip_sums(iy * iy, select)
    det = gxx * gyy - gxy * gxy
    inv_det = jnp.where(jnp.abs(det) > 1e-8, 1.0 / det, 0.0)
    samp1 = functools.partial(_sample_group, i1_ref, window=window,
                              height=height, width=width, narrow=narrow)

    def body(_, carry):
        cdx, cdy = carry
        resid = samp1(px + cdx, py + cdy) - t_win
        bxv = _strip_sums(resid * ix, select)
        byv = _strip_sums(resid * iy, select)
        cdx = cdx - inv_det * (gyy * bxv - gxy * byv)
        cdy = cdy - inv_det * (-gxy * bxv + gxx * byv)
        return cdx, cdy

    dx, dy = jax.lax.fori_loop(
        0, iterations, body, (start[:, 0:1] - px, start[:, 1:2] - py)
    )
    return jnp.concatenate([px + dx, py + dy], axis=1)


def _lk_pair_kernel(
    queries_ref,  # [N, 2] f32
    template_pos_ref,  # [N, 2] f32 — positions for the persistent template
    init_vel_ref,  # [N, 2] f32 — velocity-prior seed (chunk continuation)
    *refs,  # tmpl frame(s) + 2L frame refs + (tracks, vis, vel) outputs
    #         + (pos, vel) scratch
    num_levels: int,
    window: int,
    iterations: int,
    fb_threshold: float,
    ncc_threshold: float,
    template_ncc_threshold: float,
    corr_radius: int,
    corr_iterations: int,
    corr_accept: float,
    rescue_level: int,
    shapes: tuple,
    narrow: bool,
):
    tmpl_ref = refs[0]  # finest-level template frame (persistent, index 0)
    n_tmpl = 1
    if corr_radius > 0 and rescue_level > 0:
        tmpl_rescue_ref = refs[1]  # rescue-level template frame
        n_tmpl = 2
    level_refs = refs[n_tmpl : n_tmpl + 2 * num_levels]
    tracks_ref, vis_ref, vel_out_ref = refs[
        n_tmpl + 2 * num_levels : n_tmpl + 3 + 2 * num_levels
    ]
    pos_ref = refs[n_tmpl + 3 + 2 * num_levels]
    vel_ref = refs[n_tmpl + 4 + 2 * num_levels]

    i0_refs = [level_refs[2 * l] for l in range(num_levels)]
    i1_refs = [level_refs[2 * l + 1] for l in range(num_levels)]
    height, width = shapes[0]
    masks = [
        _window_mask(window, 128 if narrow else shapes[l][1])
        for l in range(num_levels)
    ]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        pos_ref[:] = queries_ref[:]
        vel_ref[:] = init_vel_ref[:]

    num_points = queries_ref.shape[0]

    # Groups of 8 keep every VMEM load/store offset sublane-aligned (Mosaic
    # requires %8 dynamic offsets); within a group everything is stacked
    # [128, W] / [8, 1] vector work (see _track_group_one_dir).
    def group_body(g, _):
        base = pl.multiple_of(g * 8, 8)
        grp = pos_ref[pl.ds(base, 8), :]  # [8, 2]
        vel = vel_ref[pl.ds(base, 8), :]  # [8, 2] constant-velocity prior
        fwd, min_eig = _track_group_one_dir(
            i0_refs, i1_refs, shapes, masks, grp, window, iterations, narrow,
            init_disp=vel,
        )
        if corr_radius > 0:
            # Drift-free re-localization (ops/lk.py is the oracle):
            # cost-volume snaps (fine level + the rescue level, whose
            # +-radius grid spans radius * 2^lvl full-res pixels) are
            # GN-polished at the finest level, every candidate is verified
            # by the fine template's center-weighted NCC at its polished
            # position, and the verified argmax must beat the LK
            # estimate's own score by a clear margin.
            select = _select_matrix()
            expand = _expand_matrix()
            mask0 = masks[0]
            wt = _gauss_weight_tile(window, mask0.shape[1])
            tq = template_pos_ref[pl.ds(base, 8), :]  # [8, 2]

            def centered(win):
                win = win * mask0
                mean = _strip_sums(win * wt, select)
                return (win - _expand8(mean, expand)) * mask0

            def ncc_of(am, bm):
                cov = _strip_sums(am * bm * wt, select)
                var = (
                    _strip_sums(am * am * wt, select)
                    * _strip_sums(bm * bm * wt, select)
                )
                return cov / (jnp.sqrt(var) + 1e-6)

            samp1 = functools.partial(
                _sample_group, i1_refs[0], window=window,
                height=height, width=width, narrow=narrow,
            )
            samp_t = functools.partial(
                _sample_group, tmpl_ref, window=window,
                height=height, width=width, narrow=narrow,
            )
            tm = centered(samp_t(tq[:, 0:1], tq[:, 1:2]))

            def template_score(pxy):
                return ncc_of(tm, centered(samp1(pxy[:, 0:1], pxy[:, 1:2])))

            snapped, _ = _corr_refine_group(
                tmpl_ref, i1_refs[0], tq, fwd, window, corr_radius,
                height, width, narrow,
            )
            candidates = [
                _gn_polish_group(
                    i0_refs[0], i1_refs[0], grp, snapped, window,
                    corr_iterations, height, width, narrow, masks[0],
                )
            ]
            if rescue_level > 0:
                lvl = rescue_level
                scale = 2.0 ** lvl
                h_c, w_c = shapes[lvl]
                snap_c, _ = _corr_refine_group(
                    tmpl_rescue_ref, i1_refs[lvl], tq / scale, fwd / scale,
                    window, corr_radius, h_c, w_c, narrow,
                )
                candidates.append(
                    _gn_polish_group(
                        i0_refs[0], i1_refs[0], grp, snap_c * scale, window,
                        corr_iterations, height, width, narrow, masks[0],
                    )
                )
            score_lk = template_score(fwd)  # [8, 1]
            best, best_score = fwd, score_lk
            for cand in candidates:
                s = template_score(cand)
                better = s > best_score
                best = jnp.where(better, cand, best)
                best_score = jnp.maximum(best_score, s)
            accept = (
                (best_score > corr_accept) & (best_score > score_lk + 0.1)
            )
            fwd = jnp.where(accept, best, fwd)
        nx = fwd[:, 0:1]
        ny = fwd[:, 1:2]
        in_bounds = (
            (nx >= 0) & (nx <= width - 1) & (ny >= 0) & (ny <= height - 1)
        )
        visible = in_bounds & (min_eig > 1e-6)
        if fb_threshold > -1.0:
            # Skippable (fb_threshold <= -1): halves kernel cost; see
            # ops/lk.py and the tracking-quality benchmark.
            # Backward seeds from the negated forward displacement (the
            # constant-velocity prior's mirror): without it, fast motion the
            # prior recovered would flunk FB purely on pull-in range.
            bwd, _ = _track_group_one_dir(
                i1_refs, i0_refs, shapes, masks, fwd, window, iterations,
                narrow, init_disp=grp - fwd,
            )
            fb_err = jnp.sqrt(
                jnp.sum((bwd - grp) ** 2, axis=1, keepdims=True)
            )  # [8, 1]
            visible &= fb_err < fb_threshold
        if ncc_threshold > -1.0 or template_ncc_threshold > -1.0:
            # Occlusion reasoning: center-weighted NCC of the tracked window
            # vs (a) the previous frame and (b) the persistent template
            # frame (same math as ops/lk._weighted_ncc, on stacked strips —
            # center weighting makes "the POINT is covered" dominate even
            # when an occluder only clips the window edge).
            select = _select_matrix()
            expand = _expand_matrix()
            mask0 = masks[0]
            wt = _gauss_weight_tile(window, mask0.shape[1])

            def centered(win):
                win = win * mask0
                mean = _strip_sums(win * wt, select)  # weights sum to 1
                return (win - _expand8(mean, expand)) * mask0

            def ncc_of(am, bm):
                cov = _strip_sums(am * bm * wt, select)  # [8, 1]
                var = (
                    _strip_sums(am * am * wt, select)
                    * _strip_sums(bm * bm * wt, select)
                )
                return cov / (jnp.sqrt(var) + 1e-6)

            samp1 = functools.partial(
                _sample_group, i1_refs[0], window=window,
                height=height, width=width, narrow=narrow,
            )
            bm = centered(samp1(nx, ny))
            if ncc_threshold > -1.0:
                samp0 = functools.partial(
                    _sample_group, i0_refs[0], window=window,
                    height=height, width=width, narrow=narrow,
                )
                am = centered(samp0(grp[:, 0:1], grp[:, 1:2]))
                visible &= ncc_of(am, bm) > ncc_threshold
            if template_ncc_threshold > -1.0:
                tq = template_pos_ref[pl.ds(base, 8), :]  # [8, 2]
                samp_t = functools.partial(
                    _sample_group, tmpl_ref, window=window,
                    height=height, width=width, narrow=narrow,
                )
                tm = centered(samp_t(tq[:, 0:1], tq[:, 1:2]))
                visible &= ncc_of(tm, bm) > template_ncc_threshold
        new_pos = jnp.concatenate(
            [jnp.clip(nx, 0, width - 1), jnp.clip(ny, 0, height - 1)], axis=1
        )  # [8, 2]
        pos_ref[pl.ds(base, 8), :] = new_pos
        # Velocity carry, clipped so a garbage displacement (lost track)
        # cannot fling the next frame's search arbitrarily far (oracle:
        # ops/lk._track_all).
        new_vel = jnp.clip(new_pos - grp, -32.0, 32.0)
        vel_ref[pl.ds(base, 8), :] = new_vel
        vel_out_ref[pl.ds(base, 8), :] = new_vel
        tracks_ref[pl.ds(base, 8), :] = new_pos
        vis_ref[pl.ds(base, 8), :] = visible.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_points // 8, group_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_levels", "window", "iterations", "fb_threshold",
                     "ncc_threshold", "template_ncc_threshold",
                     "corr_radius", "corr_iterations", "corr_accept",
                     "corr_rescue_level", "input_scale", "narrow",
                     "interpret", "return_velocity"),
)
def track_video_lk_pallas(
    video,  # [T H W 3] uint8/float
    queries,  # [N 2] f32 (x, y) at frame 0
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
    template_frame=None,  # [H W] f32 gray; default = this video's frame 0
    template_pos=None,  # [N 2] f32; default = queries
    init_velocity=None,  # [N 2] f32 velocity-prior seed; default zeros
    input_scale: float = 1.0,
    narrow: bool = True,
    interpret: bool = False,
    return_velocity: bool = False,
):
    """TPU-resident LK tracking; same contract as tdspa.ops.lk.track_video_lk.

    ``template_frame``/``template_pos`` override the persistent-template
    source for the appearance check — chunked tracking passes the original
    video's first frame + original queries so every chunk checks against the
    same template (chunk-parity with the single-call path).
    ``init_velocity``/``return_velocity`` chain the constant-velocity prior
    across chunk boundaries the same way (pass the previous chunk's returned
    velocity as the next chunk's seed).

    ``input_scale=0.5`` tracks on a half-resolution luma pyramid (serving
    knob): the 2x2-mean level that would be the pyramid's own level 1
    becomes the finest level, so per-group work drops by the finest level's
    share (~1/3 at 3 levels) at a sub-pixel accuracy cost measured in
    docs/BENCHMARKS.md ("Tracking input-scale knob"). All coordinates in
    and out stay in FULL-resolution pixels; ``fb_threshold`` is applied in
    tracked-resolution pixels (scaled internally, preserving the full-res
    tolerance contract).
    """
    from tdspa.ops.lk import _downsample2, _to_gray, build_pyramid

    if window > 7:
        raise ValueError("track_video_lk_pallas supports window <= 7 "
                         "(samples live in an 8-row register tile)")
    if corr_radius > 0 and 2 * corr_radius + window - 1 > 16:
        # span <= 16: the 24-row strip staging in _load_strips keeps 16
        # aligned rows valid after the up-to-7-row alignment roll.
        raise ValueError(
            "corr_radius too large: the candidate-window union "
            f"(2*{corr_radius} + {window} - 1) must fit 16 aligned strip "
            "rows"
        )
    if input_scale not in (1.0, 0.5):
        raise ValueError(f"input_scale must be 1.0 or 0.5, got {input_scale}")
    gray = _to_gray(jnp.asarray(video))
    if input_scale == 0.5:
        # Half-res pixel center i sits at full-res 2i + 0.5 (2x2 mean):
        # x_half = (x_full - 0.5) / 2. Thresholds in tracked px.
        gray = _downsample2(gray)
        queries = (jnp.asarray(queries, jnp.float32) - 0.5) * 0.5
        if template_pos is not None:
            template_pos = (jnp.asarray(template_pos, jnp.float32) - 0.5) * 0.5
        if template_frame is not None:
            template_frame = _downsample2(
                jnp.asarray(template_frame, jnp.float32)[None]
            )[0]
        if init_velocity is not None:
            init_velocity = jnp.asarray(init_velocity, jnp.float32) * 0.5
        fb_threshold = float(fb_threshold) * 0.5
    num_frames, height, width = gray.shape
    # Every level must be >= one full (8, 128) register tile: Mosaic rejects
    # sub-128-lane frame shapes ("unsupported unaligned shape").
    while num_levels > 1 and min(height, width) // (2 ** (num_levels - 1)) < 128:
        num_levels -= 1
    num_points_orig = queries.shape[0]
    pad = (-num_points_orig) % 8
    queries = jnp.asarray(queries, jnp.float32)
    if template_pos is None:
        template_pos = queries
    template_pos = jnp.asarray(template_pos, jnp.float32)
    if init_velocity is None:
        init_velocity = jnp.zeros_like(queries)
    init_velocity = jnp.asarray(init_velocity, jnp.float32)
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, 2), jnp.float32)], axis=0
        )
        template_pos = jnp.concatenate(
            [template_pos, jnp.zeros((pad, 2), jnp.float32)], axis=0
        )
        init_velocity = jnp.concatenate(
            [init_velocity, jnp.zeros((pad, 2), jnp.float32)], axis=0
        )
    num_points = queries.shape[0]
    pyramids = build_pyramid(gray, num_levels)
    shapes = tuple((p.shape[1], p.shape[2]) for p in pyramids)
    if template_frame is None:
        template_frame = gray[0]
    template_frame = jnp.asarray(template_frame, jnp.float32)
    rescue_level = int(corr_rescue_level) if corr_radius > 0 else 0
    rescue_level = min(rescue_level, num_levels - 1)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # queries (full)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # template positions (full)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # init velocity (full)
        # Template frame: fixed block index — stays VMEM-staged every step.
        pl.BlockSpec((height, width), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [queries, template_pos, init_velocity, template_frame]
    if rescue_level > 0:
        # Rescue-level template frame: the template's own pyramid level
        # (same downsampling as the video pyramid).
        tmpl_rescue = build_pyramid(
            template_frame[None], rescue_level + 1
        )[rescue_level][0]
        h_r, w_r = shapes[rescue_level]
        in_specs.append(
            pl.BlockSpec((h_r, w_r), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(tmpl_rescue)
    for lvl in range(num_levels):
        h_l, w_l = shapes[lvl]
        operands += [pyramids[lvl], pyramids[lvl]]
        in_specs += [
            pl.BlockSpec((None, h_l, w_l), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h_l, w_l), lambda t: (t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _lk_pair_kernel,
        num_levels=num_levels,
        window=window,
        iterations=iterations,
        fb_threshold=float(fb_threshold),
        ncc_threshold=float(ncc_threshold),
        template_ncc_threshold=float(template_ncc_threshold),
        corr_radius=int(corr_radius),
        corr_iterations=int(corr_iterations),
        corr_accept=float(corr_accept),
        rescue_level=rescue_level,
        shapes=shapes,
        narrow=narrow and width >= 128,
    )
    tracks, vis, vel_final = pl.pallas_call(
        kernel,
        grid=(num_frames - 1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, num_points, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, num_points, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # Final velocity: constant block index — last grid step wins.
            pl.BlockSpec((num_points, 2), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_frames - 1, num_points, 2), jnp.float32),
            jax.ShapeDtypeStruct((num_frames - 1, num_points, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_points, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_points, 2), jnp.float32),  # positions
            pltpu.VMEM((num_points, 2), jnp.float32),  # velocity prior
        ],
        # The kernel's live set (stacked [128, W'] strip tiles; with
        # corr_radius also the cost-volume union patch + weighted moments +
        # 49-tap cross term) pushes the per-step scoped stack past Mosaic's
        # conservative 16 MB default (measured: 20.55M at corr_radius=4,
        # 18.0M for the plain config with the velocity prior; T=150,
        # 512x512, 3 levels). Staged blocks here total < 12 MB
        # double-buffered, so v5e's 128 MiB VMEM has ample headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)

    tracks = jnp.concatenate([queries[None, :, :2], tracks], axis=0)[
        :, :num_points_orig
    ]  # [T N 2]
    visible = jnp.concatenate(
        [jnp.ones((1, num_points, 1), jnp.float32), vis], axis=0
    )[:, :num_points_orig]
    if input_scale == 0.5:
        # Back to full-resolution pixels (exact inverse of the input map:
        # the prepended query row returns to the caller's original values).
        tracks = tracks * 2.0 + 0.5
        vel_final = vel_final * 2.0
    out = (
        jnp.transpose(tracks, (1, 0, 2)),
        jnp.transpose(visible, (1, 0, 2)),
    )
    if return_velocity:
        return out + (vel_final[:num_points_orig],)
    return out
