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
* per point (``fori_loop``): coarse-to-fine Gauss-Newton with ``iterations``
  refinement steps per level, then a backward pass for forward-backward
  visibility checking — the same math as tdspa/ops/lk.py (the test oracle),
  up to edge behavior: windows clipping the frame border shift inward rather
  than clamping per pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_mask(window: int, width: int):
    """[8, W] mask selecting the top-left [window, window] block."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
    return ((rows < window) & (cols < window)).astype(jnp.float32)


def _sample_window(img_ref, u, v, window: int, height: int, width: int):
    """[8, W] tile whose [0:w, 0:w] block holds bilinear window samples.

    Samples the frame at (u + ox, v + oy) for o in [-r, r]^2. All samples
    share one fractional part, so the window equals a weighted sum of four
    one-pixel-shifted views. Mosaic alignment rules shape the implementation:
    sublane (row) dynamic slices must be 8-aligned (aligned 16-row strip +
    dynamic roll), lane (column) offsets cannot be dynamically sliced at all
    (dynamic roll instead), and registers only support aligned static slices
    (the shifted views come from whole-strip static rolls; consumers mask the
    valid [w, w] block via ``_window_mask``).
    """
    r = (window - 1) // 2
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    wx = u - iu
    wy = v - iv
    col = jnp.clip(iu.astype(jnp.int32) - r, 0, width - window - 1)
    row = jnp.clip(iv.astype(jnp.int32) - r, 0, height - window - 1)
    row_base = pl.multiple_of(jnp.clip((row // 8) * 8, 0, height - 16), 8)
    strip = img_ref[pl.ds(row_base, 16), :]  # [16, W]
    # pltpu.roll requires non-negative shifts: left-roll by k == right-roll
    # by (size - k).
    strip = pltpu.roll(strip, (16 - (row - row_base)) % 16, axis=0)
    strip = pltpu.roll(strip, (width - col) % width, axis=1)
    # Note: slicing the strip to one 128-lane tile here measures SLOWER
    # (repacking outweighs the narrower arithmetic); full-width ops stay.
    s01 = pltpu.roll(strip, width - 1, axis=1)
    s10 = pltpu.roll(strip, 15, axis=0)
    s11 = pltpu.roll(s01, 15, axis=0)
    combined = (
        strip * (1 - wx) * (1 - wy)
        + s01 * wx * (1 - wy)
        + s10 * (1 - wx) * wy
        + s11 * wx * wy
    )
    return combined[:8, :]


def _track_point_one_dir(i0_refs, i1_refs, shapes, masks, x, y, window,
                         iterations):
    """Coarse-to-fine LK for one point; returns (new_x, new_y, min_eig)."""
    num_levels = len(i0_refs)
    dx = jnp.float32(0.0)
    dy = jnp.float32(0.0)
    min_eig = jnp.float32(0.0)

    for lvl in reversed(range(num_levels)):
        scale = 2.0**lvl
        height, width = shapes[lvl]
        mask = masks[lvl]  # [8, W_l] valid-window mask
        px = x / scale
        py = y / scale

        samp0 = functools.partial(
            _sample_window, i0_refs[lvl], window=window,
            height=height, width=width,
        )
        t_win = samp0(px, py)
        ix = (samp0(px + 0.5, py) - samp0(px - 0.5, py)) * mask
        iy = (samp0(px, py + 0.5) - samp0(px, py - 0.5)) * mask

        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (trace - jnp.sqrt(jnp.maximum(trace**2 - 4 * det, 0.0))) / 2.0
        inv_det = jnp.where(jnp.abs(det) > 1e-8, 1.0 / det, 0.0)

        samp1 = functools.partial(
            _sample_window, i1_refs[lvl], window=window,
            height=height, width=width,
        )

        def iter_body(_, carry, _samp1=samp1, _t=t_win, _ix=ix, _iy=iy,
                      _inv=inv_det, _gxx=gxx, _gxy=gxy, _gyy=gyy,
                      _px=px, _py=py):
            cdx, cdy = carry
            p_win = _samp1(_px + cdx, _py + cdy)
            resid = p_win - _t  # garbage outside the window; ix/iy are masked
            bxv = jnp.sum(resid * _ix)
            byv = jnp.sum(resid * _iy)
            cdx = cdx - _inv * (_gyy * bxv - _gxy * byv)
            cdy = cdy - _inv * (-_gxy * bxv + _gxx * byv)
            return cdx, cdy

        dx, dy = jax.lax.fori_loop(0, iterations, iter_body, (dx, dy))
        if lvl > 0:
            dx = dx * 2.0
            dy = dy * 2.0
    return x + dx, y + dy, min_eig


def _lk_pair_kernel(
    queries_ref,  # [N, 2] f32
    *refs,  # 2L frame refs + (tracks, vis) outputs + pos scratch
    num_levels: int,
    window: int,
    iterations: int,
    fb_threshold: float,
    shapes: tuple,
):
    level_refs = refs[: 2 * num_levels]
    tracks_ref, vis_ref = refs[2 * num_levels : 2 * num_levels + 2]
    pos_ref = refs[2 * num_levels + 2]

    i0_refs = [level_refs[2 * l] for l in range(num_levels)]
    i1_refs = [level_refs[2 * l + 1] for l in range(num_levels)]
    height, width = shapes[0]
    masks = [_window_mask(window, shapes[l][1]) for l in range(num_levels)]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        pos_ref[:] = queries_ref[:]

    num_points = queries_ref.shape[0]

    # Points process in groups of 8 so every VMEM load/store offset is
    # sublane-aligned (Mosaic requires %8 dynamic offsets); the inner 8 are
    # statically unrolled over a register-resident group.
    def group_body(g, _):
        base = pl.multiple_of(g * 8, 8)
        grp = pos_ref[pl.ds(base, 8), :]  # [8, 2]
        new_rows = []
        vis_rows = []
        for j in range(8):
            x = grp[j, 0]
            y = grp[j, 1]
            nx, ny, min_eig = _track_point_one_dir(
                i0_refs, i1_refs, shapes, masks, x, y, window, iterations
            )
            bx_, by_, _ = _track_point_one_dir(
                i1_refs, i0_refs, shapes, masks, nx, ny, window, iterations
            )
            fb_err = jnp.sqrt((bx_ - x) ** 2 + (by_ - y) ** 2)
            in_bounds = (
                (nx >= 0) & (nx <= width - 1) & (ny >= 0) & (ny <= height - 1)
            )
            visible = (fb_err < fb_threshold) & in_bounds & (min_eig > 1e-6)
            # Scalars splat to 2D directly: 1D vectors don't lower on TPU.
            cx = jnp.clip(nx, 0, width - 1)[jnp.newaxis, jnp.newaxis]
            cy = jnp.clip(ny, 0, height - 1)[jnp.newaxis, jnp.newaxis]
            new_rows.append(jnp.concatenate([cx, cy], axis=1))  # [1, 2]
            vis_rows.append(
                visible.astype(jnp.float32)[jnp.newaxis, jnp.newaxis]
            )
        new_pos = jnp.concatenate(new_rows, axis=0)  # [8, 2]
        pos_ref[pl.ds(base, 8), :] = new_pos
        tracks_ref[pl.ds(base, 8), :] = new_pos
        vis_ref[pl.ds(base, 8), :] = jnp.concatenate(vis_rows, axis=0)
        return 0

    jax.lax.fori_loop(0, num_points // 8, group_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_levels", "window", "iterations", "fb_threshold",
                     "interpret"),
)
def track_video_lk_pallas(
    video,  # [T H W 3] uint8/float
    queries,  # [N 2] f32 (x, y) at frame 0
    num_levels: int = 3,
    window: int = 7,
    iterations: int = 4,
    fb_threshold: float = 2.0,
    interpret: bool = False,
):
    """TPU-resident LK tracking; same contract as tdspa.ops.lk.track_video_lk."""
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
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, 2), jnp.float32)], axis=0
        )
    num_points = queries.shape[0]
    pyramids = build_pyramid(gray, num_levels)
    shapes = tuple((p.shape[1], p.shape[2]) for p in pyramids)

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]  # queries (full)
    operands = [jnp.asarray(queries, jnp.float32)]
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
        shapes=shapes,
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
