"""Global-motion (similarity) estimation and TPU-native video warping.

Strong camera roll defeats every translation-template tracker in the
stack: classical LK compares axis-aligned windows against an unrotated
frame-0 template, and the learned matcher's cost patches are equally
axis-aligned (measured: rot_strong pts-within-2 0.489 classical / 0.525
matcher, vs 0.94+ on the same photometric degradation without roll).
The fix is geometric: estimate the per-frame global similarity transform
from the classical pass's own tracks, counter-warp the video into the
frame-0 frame, re-track there (residual motion is small and
translation-like), and map positions back through the transform. This is
the camera-motion-compensation step CoTracker-class trackers absorb into
learned features, done explicitly — and it composes with the matcher,
which then sees a de-rotated (merely degraded) scene it already wins on.

Two TPU-specific design points (both measured, docs/BENCHMARKS.md
round 4):

* The per-frame similarity fit is a complex least-squares (z = x + iy;
  z_t ~ w z_{t-1} + b solves scaled-rotation Procrustes in closed form,
  no SVD) written out in REAL pairs — complex64 is unimplemented on the
  TPU backend (measured on-chip) — vectorized over all frames, with
  hard inlier reweighting.
  Fits are consecutive-frame (inter-frame motion is always small, so
  inliers survive ANY cumulative rotation where frame-0-referenced fits
  starve past ~40 deg) and composed cumulatively by a ``lax.scan``.
* The warp avoids XLA gathers entirely — a full-frame gather warp
  measured 508 s for 150x512x512 on v5e (the known ~1000x TPU gather
  penalty). Instead: rotation via Paeth shear passes (each pass is a
  per-8-row-block dynamic_slice at the block's base shift plus a
  static-tap hat-weighted combination for the per-row residual — all
  vector ops), and scale/translation via ``jax.image.scale_and_translate``
  (separable matmul resampling). Shear passes run as one ``lax.scan``
  over (frame, block) with no gather anywhere.

Reference capability slot: inference.py:97-154 (CoTracker3 handles
rotating content through its learned correlation features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Taps for the per-row residual shift within an 8-row block: residual
# <= 7*|shear| + 1 interp tap. Shear coefficients are kept <= tan(22.5)
# = 0.414 (alpha) / sin(45) = 0.707 (beta) by angle-halving, so 7 taps
# always cover; 8 keeps the slice lane count even.
_TAPS = 8
_BLOCK = 8


@functools.partial(
    jax.jit, static_argnames=("rounds", "inlier_px", "min_inliers")
)
def fit_similarity_sequence(tracks, rounds: int = 3,
                            inlier_px: float = 2.0, min_inliers: int = 4):
    """Per-frame global similarity from tracks, robust + composed.

    tracks: [N T 2] (x, y). Occlusion labels are deliberately not an
    input: the robust reweighting prunes drifted points better than LK's
    occlusion labels on collapsed content — the labels are exactly what's
    unreliable there.

    Returns dict with:
      A [T 2 2], t [T 2]: frame-0 -> frame-t similarity (p_t = A p_0 + t),
      angle_deg [T], scale [T], inlier_frac [T] (consecutive-frame fit
      support; index 0 is 1.0 by convention).
    """
    tracks = jnp.asarray(tracks, jnp.float32)
    n = tracks.shape[0]
    # The complex LS z_t ~ w z_{t-1} + b, expanded into real pairs
    # (complex64 is UNIMPLEMENTED on the TPU backend — measured on-chip):
    # w = (wr, wi) acts on (x, y) as the scaled rotation
    # [wr -wi; wi wr], and all complex products below are written out.
    x0, y0 = tracks[:, :-1, 0], tracks[:, :-1, 1]  # [N T-1]
    x1, y1 = tracks[:, 1:, 0], tracks[:, 1:, 1]
    w = jnp.ones(x0.shape, jnp.float32)
    wr = jnp.ones(x0.shape[1], jnp.float32)
    wi = jnp.zeros(x0.shape[1], jnp.float32)
    bx = jnp.zeros(x0.shape[1], jnp.float32)
    by = jnp.zeros(x0.shape[1], jnp.float32)
    # Annealed inlier threshold: gross outliers (drifted tracks) pull the
    # all-points round-0 fit several px off every GOOD point, so a hard
    # cut at inlier_px there can empty the support; start wide, tighten.
    anneal = [inlier_px * 2.0 ** (rounds - 1 - r) for r in range(rounds)]
    for thr in anneal:
        ws = w.sum(0) + 1e-8
        mx0, my0 = (w * x0).sum(0) / ws, (w * y0).sum(0) / ws
        mx1, my1 = (w * x1).sum(0) / ws, (w * y1).sum(0) / ws
        cx0, cy0 = x0 - mx0, y0 - my0
        cx1, cy1 = x1 - mx1, y1 - my1
        # num = sum w conj(c0) c1; den = sum w |c0|^2
        num_r = (w * (cx0 * cx1 + cy0 * cy1)).sum(0)
        num_i = (w * (cx0 * cy1 - cy0 * cx1)).sum(0)
        den = (w * (cx0 * cx0 + cy0 * cy0)).sum(0) + 1e-8
        wr, wi = num_r / den, num_i / den
        bx = mx1 - (wr * mx0 - wi * my0)
        by = my1 - (wi * mx0 + wr * my0)
        resid = jnp.hypot(
            x1 - (wr * x0 - wi * y0 + bx), y1 - (wi * x0 + wr * y0 + by)
        )
        w_new = (resid < thr).astype(jnp.float32)
        # Per-frame guard: a cut that starves a frame's support keeps the
        # previous round's weights there instead of fitting on noise.
        keep = w_new.sum(0) >= min_inliers
        w = jnp.where(keep[None, :], w_new, w)
    inliers = ((resid < inlier_px).astype(jnp.float32) * w).sum(0)
    ok = inliers >= min_inliers
    wr = jnp.where(ok, wr, 1.0)
    wi = jnp.where(ok, wi, 0.0)
    bx = jnp.where(ok, bx, 0.0)
    by = jnp.where(ok, by, 0.0)

    def compose(carry, step):
        pwr, pwi, pbx, pby = carry
        swr, swi, sbx, sby = step
        nxt = (
            swr * pwr - swi * pwi,
            swr * pwi + swi * pwr,
            swr * pbx - swi * pby + sbx,
            swi * pbx + swr * pby + sby,
        )
        return nxt, nxt

    one = jnp.ones(())
    zero = jnp.zeros(())
    _, (cwr, cwi, cbx, cby) = lax.scan(
        compose, (one, zero, zero, zero), (wr, wi, bx, by)
    )
    cwr = jnp.concatenate([jnp.ones((1,)), cwr])
    cwi = jnp.concatenate([jnp.zeros((1,)), cwi])
    cbx = jnp.concatenate([jnp.zeros((1,)), cbx])
    cby = jnp.concatenate([jnp.zeros((1,)), cby])
    a_mat = jnp.stack(
        [jnp.stack([cwr, -cwi], -1), jnp.stack([cwi, cwr], -1)], -2
    )  # [T 2 2]: complex multiply as a 2x2 on (x, y)
    t_vec = jnp.stack([cbx, cby], -1)  # [T 2]
    return {
        "A": a_mat,
        "t": t_vec,
        "angle_deg": jnp.degrees(jnp.arctan2(cwi, cwr)),
        "scale": jnp.hypot(cwr, cwi),
        "inlier_frac": jnp.concatenate(
            [jnp.ones((1,)), inliers / float(max(n, 1))]
        ),
    }


def apply_similarity(a_mat, t_vec, pos):
    """p_t = A_t p + t_t for pos [N T 2] (stabilized -> original coords)."""
    return jnp.einsum("tij,ntj->nti", a_mat, pos) + t_vec[jnp.newaxis]


def _shear_x_pass(frames, alpha, beta):
    """out[t, y, x] = in[t, y, x + alpha_t * (y - cy) + beta_t].

    frames [T H W] f32; alpha/beta [T]. Gather-free: scan over
    (frame, 8-row block); each step takes ONE dynamic_slice at the
    block's integer base shift and forms the per-row residual by a
    static-tap hat-weighted sum — vector ops only. Edge padding.
    """
    t, h, w = frames.shape
    cy = (h - 1) / 2.0
    nb = h // _BLOCK
    # max |shift| given the halved-angle coefficient bounds; +slack taps.
    pad = int(np.ceil(0.708 * cy)) + _TAPS + 2
    padded = jnp.pad(frames, ((0, 0), (0, 0), (pad, pad)), mode="edge")

    ys = jnp.arange(h, dtype=jnp.float32) - cy  # [H]
    shift = alpha[:, None] * ys[None, :] + beta[:, None]  # [T H]
    blk = shift.reshape(t, nb, _BLOCK)
    base = jnp.floor(jnp.min(blk, axis=2)).astype(jnp.int32)  # [T nb]
    resid = blk - base[..., None].astype(jnp.float32)  # [T nb 8] in [0, taps)

    tap = jnp.arange(_TAPS, dtype=jnp.float32)
    wts = jnp.maximum(0.0, 1.0 - jnp.abs(resid[..., None] - tap))
    # [T nb 8 taps] hat weights; two adjacent taps nonzero per row.

    t_idx = jnp.repeat(jnp.arange(t), nb)
    b_idx = jnp.tile(jnp.arange(nb), t)

    def body(_, x):
        ti, bi = x
        start_col = pad + base[ti, bi]
        sl = lax.dynamic_slice(
            padded, (ti, bi * _BLOCK, start_col), (1, _BLOCK, w + _TAPS)
        )[0]  # [8, W + taps]
        wrow = wts[ti, bi]  # [8 taps]
        out = jnp.zeros((_BLOCK, w), frames.dtype)
        for m in range(_TAPS):  # static taps: unrolled vector FMAs
            out = out + wrow[:, m : m + 1] * lax.dynamic_slice_in_dim(
                sl, m, w, axis=1
            )
        return None, out

    _, blocks = lax.scan(body, None, (t_idx, b_idx))
    return blocks.reshape(t, nb * _BLOCK, w)


def _shear_y_pass(frames, alpha, beta):
    """out[t, y, x] = in[t, y + alpha_t * (x - cx) + beta_t, x]."""
    return jnp.swapaxes(
        _shear_x_pass(jnp.swapaxes(frames, 1, 2), alpha, beta), 1, 2
    )


def _paeth_rotate(frames, theta):
    """Backward-rotate each frame about its center by theta_t (radians):
    out(p) = in(c + R(theta_t)(p - c)). Three shear passes (Paeth)."""
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    z = jnp.zeros_like(theta)
    out = _shear_x_pass(frames, a, z)
    out = _shear_y_pass(out, b, z)
    return _shear_x_pass(out, a, z)


MAX_WARP_ANGLE_DEG = 100.0
"""Cumulative-roll budget of ``warp_video_similarity``.

The unconditional angle-halving keeps each Paeth pass's shear residual
within the 8-tap hat window up to ~150 deg, but the y-shear's column pad
is fixed at 0.708*cy = sin(45 deg) — past |theta|/2 = 50 deg the shear
displacement exceeds it and edge rows read padding (measured vs the
gather oracle: clean to ~110 deg, 18% of valid pixels >20 gray-levels
wrong at 150 deg). Callers must not warp beyond this budget; the
tracker's escalation gate enforces it (tdspa/features/tracks.py
STAB_MAX_ANGLE_DEG).
"""


@jax.jit
def warp_video_similarity(video_gray, a_mat, t_vec):
    """Stabilize: out_t(p) = in_t(A_t p + t_t), gather-free.

    video_gray: [T H W] f32 (grayscale — the LK tracker and matcher both
    consume luma; warping one channel is a third of the traffic).
    a_mat [T 2 2] / t_vec [T 2]: the SIMILARITY p -> A p + t (A = s R).
    Rotations are accurate up to |theta| <= MAX_WARP_ANGLE_DEG; beyond
    that the fixed shear pad is exceeded and border content corrupts.

    Decomposition: A p + t = s R (p + R^-1 t / s). Translation and scale
    go through jax.image.scale_and_translate (separable, matmul-lowered);
    rotation through Paeth shears, always angle-halved into two
    applications so shear coefficients stay within the tap budget.
    H and W must be multiples of 8 (pipeline frames are; callers pad
    otherwise).
    """
    t, h, w = video_gray.shape
    frames = jnp.asarray(video_gray, jnp.float32)
    # Canvas expansion: shear intermediates push content past the frame
    # edge before a later pass brings it back (measured: unpadded, a
    # 50-deg rotation corrupts a ~50 px border band). Pad so every
    # intermediate stays on-canvas, warp on the padded canvas (same
    # similarity with t adjusted for the origin shift), crop at the end.
    pad = int(-(-0.3 * max(h, w) // _BLOCK) * _BLOCK)
    frames = jnp.pad(frames, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    pad_vec = jnp.asarray([pad, pad], jnp.float32)
    t_vec = t_vec + pad_vec - jnp.einsum("tij,j->ti", a_mat, pad_vec)
    t, h, w = frames.shape
    theta = jnp.arctan2(a_mat[:, 1, 0], a_mat[:, 0, 0])  # [T]
    s = jnp.sqrt(jnp.clip(jnp.linalg.det(a_mat), 1e-12))  # [T]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ctr = jnp.asarray([cx, cy], jnp.float32)

    # Composition: the rotate pass gives out(p) = mid(c + R(p - c)); the
    # scale/translate pass gives mid(q) = in(c + s (q - c) + s shift).
    # Chained: out(p) = in(c + s R (p - c) + s shift); matching the
    # target in(s R p + t) = in(s R (p - c) + s R c + t) requires
    #   shift = R c + (t - c) / s.
    rot = jnp.stack(
        [
            jnp.stack([jnp.cos(theta), -jnp.sin(theta)], -1),
            jnp.stack([jnp.sin(theta), jnp.cos(theta)], -1),
        ],
        -2,
    )  # R(theta) [T 2 2]
    shift = jnp.einsum("tij,j->ti", rot, ctr) + (
        t_vec - ctr[jnp.newaxis]
    ) / s[:, None]  # [T 2] (x, y)

    def scale_translate_one(args):
        frame, s_t, sh = args
        # Backward map: src_x = s_t * (x - cx) + cx + s_t * sh_x  (and y).
        # jax.image.scale_and_translate computes out(x) = in((x - tr)/sc)
        # with antialiasing off — invert to our backward map:
        # (x - tr)/sc = s_t x + (cx(1 - s_t) + s_t sh_x)
        # -> sc = 1/s_t, tr = -(cx(1 - s_t) + s_t sh_x)/s_t.
        off_x = cx * (1.0 - s_t) + s_t * sh[0]
        off_y = cy * (1.0 - s_t) + s_t * sh[1]
        scale = jnp.stack([1.0 / s_t, 1.0 / s_t])
        trans = jnp.stack([-off_y / s_t, -off_x / s_t])
        return jax.image.scale_and_translate(
            frame, (h, w), (0, 1), scale, trans, method="linear",
            antialias=False,
        )

    mid = lax.map(scale_translate_one, (frames, s, shift))

    # Pass 2: rotation. Angles are halved into two Paeth applications
    # unconditionally (keeps every shear coefficient within the
    # static-tap budget up to ~100 deg cumulative roll; one extra scan).
    out = _paeth_rotate(_paeth_rotate(mid, theta / 2.0), theta / 2.0)
    return out[:, pad:-pad, pad:-pad]


def warp_similarity_oracle(video_gray, a_mat, t_vec):
    """map_coordinates reference (gathers — test oracle only, not TPU)."""
    from jax.scipy.ndimage import map_coordinates

    t, h, w = video_gray.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    base = jnp.stack([xx.ravel(), yy.ravel()], -1)

    def one(args):
        frame, a, tv = args
        src = base @ a.T + tv
        return map_coordinates(
            frame, [src[:, 1], src[:, 0]], order=1, mode="nearest"
        ).reshape(h, w)

    return lax.map(one, (jnp.asarray(video_gray, jnp.float32), a_mat, t_vec))
