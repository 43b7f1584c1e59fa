"""Pallas TPU kernel: fused bilinear gather-interpolation over a frame grid.

The inference tail samples per-track features from dense per-frame grids
(DINOv2 patch grid [T,Hp,Wp,768], depth maps [T,H,W,1]) at N track positions
per frame — the op the reference runs as an O(N*T) host loop
(inference.py:339-447). The XLA path (tdspa.ops.geometry.bilinear_sample)
lowers to four independent dense gathers plus elementwise FMA, each
re-reading coordinate data and re-materializing [N,T,C] intermediates in HBM.

This kernel fuses the whole thing: the grid for one frame is staged into
VMEM once (DINO grid at 518px: 37*37*768*4B = 4.2 MB < 16 MB VMEM), corner
indices/weights compute on the VPU from SMEM-prefetched coordinates, and the
four corner rows are read directly from VMEM per point — one pass, no HBM
intermediates.

Grid: one program per frame. Points are processed in a ``fori_loop`` of
row-gathers (dynamic VMEM indexing), accumulating the weighted sum straight
into the output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_frame_kernel(coords_ref, grid_ref, out_ref, *, height, width):
    """One frame: grid_ref [H*W, C] VMEM, coords_ref [N, 2], out [N, C]."""
    num_points = out_ref.shape[0]

    x = coords_ref[:, 0]
    y = coords_ref[:, 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, width - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, width - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, height - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, height - 1)

    idx00 = y0 * width + x0
    idx01 = y0 * width + x1
    idx10 = y1 * width + x0
    idx11 = y1 * width + x1

    def body(i, _):
        g00 = grid_ref[idx00[i], :]
        g01 = grid_ref[idx01[i], :]
        g10 = grid_ref[idx10[i], :]
        g11 = grid_ref[idx11[i], :]
        out_ref[i, :] = (
            g00 * (1 - wx[i]) * (1 - wy[i])
            + g01 * wx[i] * (1 - wy[i])
            + g10 * (1 - wx[i]) * wy[i]
            + g11 * wx[i] * wy[i]
        )
        return 0

    jax.lax.fori_loop(0, num_points, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilinear_sample_pallas(grid, coords, interpret: bool = False):
    """Fused bilinear sampling: grid [T H W C], coords [N T 2] -> [N T C].

    Semantics identical to ``tdspa.ops.geometry.bilinear_sample`` (weights
    from the unclamped floor, corners clamped). One pallas program per frame;
    the frame's grid must fit VMEM (true for DINO patch grids and depth maps
    at the reference operating points).
    """
    num_frames, height, width, channels = grid.shape
    num_points = coords.shape[0]

    grid_flat = grid.reshape(num_frames, height * width, channels)
    coords_t = jnp.swapaxes(coords, 0, 1)  # [T N 2]

    kernel = functools.partial(
        _bilinear_frame_kernel, height=height, width=width
    )
    out = pl.pallas_call(
        kernel,
        grid=(num_frames,),
        in_specs=[
            pl.BlockSpec(
                (None, num_points, 2), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, height * width, channels), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, num_points, channels), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_frames, num_points, channels), grid.dtype
        ),
        interpret=interpret,
    )(coords_t[:, :, :], grid_flat)
    return jnp.swapaxes(out, 0, 1)  # [N T C]
