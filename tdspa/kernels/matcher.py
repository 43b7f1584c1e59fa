"""Pallas TPU kernel: learned-matcher correlation cost patches.

The matcher (tdspa/features/matcher.py) scores a (2R+1)^2 grid of
feature-space correlations around every track estimate. The XLA lowering
(`_cost_patches`) is per-point gathers — at pipeline scale (4096 points x
150 frames x 81 offsets x 4 corners) TPUs execute those catastrophically
slowly (same pathology the LK kernel exists for, tdspa/kernels/lk.py).

This kernel computes the same costs gather-free:

* The frame's stride-2 feature map is staged whole into VMEM
  ([256, 256*16] f32 = 4.2 MB at the 512px/D=16 operating point — the
  reason MatcherFeatureNet defaults to stride 2 / dim 16).
* Points process in groups of 8 (grid = (frames, N/8); the feature block's
  index map ignores the group axis, so Mosaic keeps the frame resident
  across groups). Per point: one 24-row strip load + cyclic sublane/lane
  rolls aligns an integer-cornered (span x span x D) window to the tile
  origin — the Mosaic-legal replacement for dynamic slicing (same rules as
  kernels/lk.py: 8-aligned sublane slices only, no dynamic lane offsets,
  non-negative rolls).
* All 81 sample positions of a point share one fractional part, so
  channel-contracting FIRST (patch * template, 16-lane-group reduction via
  a constant 0/1 selector matmul) gives an integer-offset projection tile
  [16 rows, 16 x], and the fractional bilinear weight is 4 shifted FMAs of
  that tile — costs never touch a gather.
* The [8 points x (9x9)] result repacks to lane-packed [8, 128] output
  (lane = dy*9+dx) with 9 pairs of tiny constant selector matmuls.

Edge behavior: windows clipping the feature-map border shift inward
(positions clamp so the span-window stays in frame) rather than clamping
per corner like the XLA path — interior-exact, border-approximate, the
same contract as the LK kernel. Parity: tests/unit/test_matcher_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdspa.kernels.lk import _expand8, _expand_matrix


def _channel_selector(dim: int, xs: int):
    """[xs*dim, xs] constant: C[l, x] = 1 iff l // dim == x."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (xs * dim, xs), 0) // dim
    cols = jax.lax.broadcasted_iota(jnp.int32, (xs * dim, xs), 1)
    return (rows == cols).astype(jnp.float32)


def _row_selector(dy: int):
    """[8, 128] constant: S[p, r] = 1 iff r == 16*p + dy."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    return (cols == 16 * rows + dy).astype(jnp.float32)


def _lane_placer(dy: int, k: int):
    """[16, 128] constant: P[dx, l] = 1 iff dx < k and l == dy*k + dx."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    return ((rows < k) & (cols == dy * k + rows)).astype(jnp.float32)


def _cost_kernel(pos_ref, tvec_ref, feats_ref, out_ref, *, radius, dim,
                 hf, wf, num_templates=1):
    """One frame x 8 points x ``num_templates`` templates.

    pos_ref [8, 2] f32 feature-px (x, y); tvec_ref [8, M*dim] f32
    (M L2-normed template features per point, channel-minor);
    feats_ref [hf, wf*dim] f32 (channel-minor); out_ref [8, M*128] f32 —
    lane m*128 + dy*(2R+1)+dx = template m's cost at offset (dx-R, dy-R),
    lanes with dy*k+dx >= (2R+1)^2 zero.

    The template-bank matcher (features/matcher.py) evaluates M ~ 5
    templates at ONE position per point: the strip loads + cyclic rolls
    (the serial per-point cost) are shared across templates, so M
    templates cost ~M tiny extra VPU/MXU passes, not M kernel calls.
    """
    k = 2 * radius + 1
    span = k + 1  # corners need one extra row/col
    xs = 16  # x-positions kept after lane alignment (>= span, 128/dim-aligned)
    width_lanes = wf * dim

    x = pos_ref[:, 0]  # [8]
    y = pos_ref[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32) - radius
    y0 = jnp.floor(y).astype(jnp.int32) - radius

    strips = []
    for j in range(8):
        cx = jnp.clip(x0[j], 0, wf - span)
        cy = jnp.clip(y0[j], 0, hf - span)
        row_base = pl.multiple_of(
            jnp.clip((cy // 8) * 8, 0, hf - 24), 8
        )
        strip = feats_ref[pl.ds(row_base, 24), :]  # [24, wf*dim]
        # Cyclic alignment: rows cy..cy+span-1 -> 0..span-1 (offset <= 7,
        # span 10 => fits 24); columns cx*dim -> lane 0.
        strip = pltpu.roll(strip, (24 - (cy - row_base)) % 24, axis=0)
        strip = pltpu.roll(
            strip, (width_lanes - cx * dim) % width_lanes, axis=1
        )
        strips.append(strip[:16, : xs * dim])
    patch = jnp.concatenate(strips, axis=0)  # [128, xs*dim]

    expand = _expand_matrix()  # [128, 8]
    # Fractional bilinear weights (shared by every offset AND template).
    wx = _expand8((x - jnp.floor(x)).reshape(8, 1), expand)  # [128, 1]
    wy = _expand8((y - jnp.floor(y)).reshape(8, 1), expand)
    sel = _channel_selector(dim, xs)

    for m in range(num_templates):
        # Channel contraction with each point's m-th template vector.
        tvec_rows = jax.lax.dot_general(
            expand, tvec_ref[:, m * dim:(m + 1) * dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [128, dim]
        tvec_tile = jnp.concatenate([tvec_rows] * xs, axis=1)
        proj = jax.lax.dot_general(
            patch * tvec_tile, sel,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [128, xs]: rows 16j+dy (dy<span), lanes dx (dx<span)

        # Bilinear combine. The whole-tile sublane roll crosses strip
        # boundaries only at each strip's row 15, outside dy < span-1 <= 9.
        p01 = pltpu.roll(proj, xs - 1, axis=1)
        p10 = pltpu.roll(proj, 127, axis=0)
        p11 = pltpu.roll(p01, 127, axis=0)
        cost = (
            proj * (1 - wx) * (1 - wy)
            + p01 * wx * (1 - wy)
            + p10 * (1 - wx) * wy
            + p11 * wx * wy
        )  # [128, xs]

        # Repack [8 points x 16 dy rows, xs dx lanes] -> [8, 128].
        out = jnp.zeros((8, 128), jnp.float32)
        for dy in range(k):
            picked = jax.lax.dot_general(
                _row_selector(dy), cost, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [8, xs]
            out = out + jax.lax.dot_general(
                picked, _lane_placer(dy, k)[:xs, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, m * 128:(m + 1) * 128] = out


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def cost_patches_pallas(feats, template_vec, positions, radius: int = 4,
                        interpret: bool = False):
    """Correlation cost patches, gather-free.

    Args:
      feats: [T Hf Wf D] f32 feature maps (Hf >= 24; Hf*Wf*D*4B must fit
        VMEM alongside its double buffer — true for 256x256x16).
      template_vec: [N D] f32 template features.
      positions: [N T 2] f32 (x, y) in FEATURE pixels.
      radius: offset-grid radius R (patch span 2R+2 <= 16).

    Returns:
      [N T (2R+1)^2] f32 costs, matching
      tdspa.features.matcher._cost_patches on interior points (border
      windows shift inward instead of edge-clamping).
    """
    return cost_patches_multi_pallas(
        feats, template_vec[:, jnp.newaxis], positions, radius=radius,
        interpret=interpret,
    )[:, :, 0]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def cost_patches_multi_pallas(feats, template_vecs, positions,
                              radius: int = 4, interpret: bool = False):
    """Template-BANK cost patches: [N M D] templates -> [N T M K2].

    One kernel pass: the per-point strip loads/rolls are shared across the
    M templates (features/matcher.py's bank evaluates every template at
    the same position), so the bank costs ~M tiny extra contraction passes
    instead of M full kernel invocations.
    """
    t, hf, wf, dim = feats.shape
    n, m = template_vecs.shape[:2]
    k2 = (2 * radius + 1) ** 2
    if hf < 24:
        raise ValueError(f"feature map too short for strip loads: {hf} < 24")
    if 2 * radius + 2 > 16:
        raise ValueError(f"radius {radius} needs span > 16")
    if 128 % dim or 16 * dim > wf * dim:
        raise ValueError(f"dim {dim} must divide 128 (and wf >= 16)")

    n_pad = -(-n // 8) * 8
    if n_pad != n:
        pad = [(0, n_pad - n)]
        positions = jnp.pad(positions, pad + [(0, 0), (0, 0)])
        template_vecs = jnp.pad(template_vecs, pad + [(0, 0), (0, 0)])
    # Padded points sit at position (0, 0) — clamped in-kernel, harmless.

    pos_t = jnp.swapaxes(positions, 0, 1)  # [T N 2]
    kernel = functools.partial(
        _cost_kernel, radius=radius, dim=dim, hf=hf, wf=wf, num_templates=m
    )
    out = pl.pallas_call(
        kernel,
        grid=(t, n_pad // 8),
        in_specs=[
            pl.BlockSpec((None, 8, 2), lambda ti, g: (ti, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m * dim), lambda ti, g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hf, wf * dim), lambda ti, g: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 8, m * 128), lambda ti, g: (ti, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n_pad, m * 128), jnp.float32),
        interpret=interpret,
    )(
        pos_t.astype(jnp.float32),
        template_vecs.reshape(n_pad, m * dim).astype(jnp.float32),
        feats.reshape(t, hf, wf * dim).astype(jnp.float32),
    )
    out = out[:, :n].reshape(t, n, m, 128)[..., :k2]  # [T N M K2]
    return jnp.transpose(out, (1, 0, 2, 3))  # [N T M K2]
