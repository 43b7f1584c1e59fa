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
    strips = []
    for j in range(8):
        uj = u[j, 0]
        vj = v[j, 0]
        col = jnp.clip(jnp.floor(uj).astype(jnp.int32) - r, 0, width - window - 1)
        row = jnp.clip(jnp.floor(vj).astype(jnp.int32) - r, 0, height - window - 1)
        row_base = pl.multiple_of(jnp.clip((row // 8) * 8, 0, height - 16), 8)
        strip = img_ref[pl.ds(row_base, 16), :]  # [16, W]
        # pltpu.roll requires non-negative shifts: left-roll by k == right-
        # roll by (size - k).
        strip = pltpu.roll(strip, (16 - (row - row_base)) % 16, axis=0)
        strip = pltpu.roll(strip, (width - col) % width, axis=1)
        if narrow:
            strip = strip[:, :128]
        strips.append(strip)
    stacked = jnp.concatenate(strips, axis=0)  # [128, W']
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
                         iterations, narrow):
    """Coarse-to-fine LK for a group of 8 points, fully stacked.

    xy: [8, 2] start positions. Returns (new_xy [8, 2], min_eig [8, 1]).
    """
    num_levels = len(i0_refs)
    select = _select_matrix()
    x = xy[:, 0:1]  # [8, 1]
    y = xy[:, 1:2]
    dx = jnp.zeros((8, 1), jnp.float32)
    dy = jnp.zeros((8, 1), jnp.float32)
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


def _lk_pair_kernel(
    queries_ref,  # [N, 2] f32
    template_pos_ref,  # [N, 2] f32 — positions for the persistent template
    *refs,  # tmpl frame + 2L frame refs + (tracks, vis) outputs + pos scratch
    num_levels: int,
    window: int,
    iterations: int,
    fb_threshold: float,
    ncc_threshold: float,
    template_ncc_threshold: float,
    shapes: tuple,
    narrow: bool,
):
    tmpl_ref = refs[0]  # finest-level template frame (persistent, index 0)
    level_refs = refs[1 : 1 + 2 * num_levels]
    tracks_ref, vis_ref = refs[1 + 2 * num_levels : 3 + 2 * num_levels]
    pos_ref = refs[3 + 2 * num_levels]

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

    num_points = queries_ref.shape[0]

    # Groups of 8 keep every VMEM load/store offset sublane-aligned (Mosaic
    # requires %8 dynamic offsets); within a group everything is stacked
    # [128, W] / [8, 1] vector work (see _track_group_one_dir).
    def group_body(g, _):
        base = pl.multiple_of(g * 8, 8)
        grp = pos_ref[pl.ds(base, 8), :]  # [8, 2]
        fwd, min_eig = _track_group_one_dir(
            i0_refs, i1_refs, shapes, masks, grp, window, iterations, narrow
        )
        nx = fwd[:, 0:1]
        ny = fwd[:, 1:2]
        in_bounds = (
            (nx >= 0) & (nx <= width - 1) & (ny >= 0) & (ny <= height - 1)
        )
        visible = in_bounds & (min_eig > 1e-6)
        if fb_threshold > -1.0:
            # Skippable (fb_threshold <= -1): halves kernel cost; see
            # ops/lk.py and the tracking-quality benchmark.
            bwd, _ = _track_group_one_dir(
                i1_refs, i0_refs, shapes, masks, fwd, window, iterations,
                narrow,
            )
            fb_err = jnp.sqrt(
                jnp.sum((bwd - grp) ** 2, axis=1, keepdims=True)
            )  # [8, 1]
            visible &= fb_err < fb_threshold
        if ncc_threshold > -1.0 or template_ncc_threshold > -1.0:
            # Occlusion reasoning: NCC of the tracked window vs (a) the
            # previous frame and (b) the persistent template frame (same
            # math as ops/lk, on stacked strips).
            select = _select_matrix()
            expand = _expand_matrix()
            mask0 = masks[0]
            k_count = float(window * window)

            def centered(win):
                win = win * mask0
                mean = _strip_sums(win, select) / k_count
                return (win - _expand8(mean, expand)) * mask0

            def ncc_of(am, bm):
                cov = _strip_sums(am * bm, select)  # [8, 1]
                var = _strip_sums(am * am, select) * _strip_sums(bm * bm, select)
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
        tracks_ref[pl.ds(base, 8), :] = new_pos
        vis_ref[pl.ds(base, 8), :] = visible.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_points // 8, group_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_levels", "window", "iterations", "fb_threshold",
                     "ncc_threshold", "template_ncc_threshold", "narrow",
                     "interpret"),
)
def track_video_lk_pallas(
    video,  # [T H W 3] uint8/float
    queries,  # [N 2] f32 (x, y) at frame 0
    num_levels: int = 3,
    window: int = 7,
    iterations: int = 4,
    fb_threshold: float = 2.0,
    ncc_threshold: float = 0.5,
    template_ncc_threshold: float = 0.3,
    template_frame=None,  # [H W] f32 gray; default = this video's frame 0
    template_pos=None,  # [N 2] f32; default = queries
    narrow: bool = True,
    interpret: bool = False,
):
    """TPU-resident LK tracking; same contract as tdspa.ops.lk.track_video_lk.

    ``template_frame``/``template_pos`` override the persistent-template
    source for the appearance check — chunked tracking passes the original
    video's first frame + original queries so every chunk checks against the
    same template (chunk-parity with the single-call path).
    """
    from tdspa.ops.lk import _to_gray, build_pyramid

    if window > 7:
        raise ValueError("track_video_lk_pallas supports window <= 7 "
                         "(samples live in an 8-row register tile)")
    gray = _to_gray(jnp.asarray(video))
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
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, 2), jnp.float32)], axis=0
        )
        template_pos = jnp.concatenate(
            [template_pos, jnp.zeros((pad, 2), jnp.float32)], axis=0
        )
    num_points = queries.shape[0]
    pyramids = build_pyramid(gray, num_levels)
    shapes = tuple((p.shape[1], p.shape[2]) for p in pyramids)
    if template_frame is None:
        template_frame = gray[0]
    template_frame = jnp.asarray(template_frame, jnp.float32)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # queries (full)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # template positions (full)
        # Template frame: fixed block index — stays VMEM-staged every step.
        pl.BlockSpec((height, width), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [queries, template_pos, template_frame]
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
        shapes=shapes,
        narrow=narrow and width >= 128,
    )
    tracks, vis = pl.pallas_call(
        kernel,
        grid=(num_frames - 1,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, num_points, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, num_points, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_frames - 1, num_points, 2), jnp.float32),
            jax.ShapeDtypeStruct((num_frames - 1, num_points, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((num_points, 2), jnp.float32)],
        interpret=interpret,
    )(*operands)

    tracks = jnp.concatenate([queries[None, :, :2], tracks], axis=0)[
        :, :num_points_orig
    ]  # [T N 2]
    visible = jnp.concatenate(
        [jnp.ones((1, num_points, 1), jnp.float32), vis], axis=0
    )[:, :num_points_orig]
    return (
        jnp.transpose(tracks, (1, 0, 2)),
        jnp.transpose(visible, (1, 0, 2)),
    )
