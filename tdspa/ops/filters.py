"""Small image filters used by the tracking escalation policy.

Separable Gaussian blur over the spatial axes of a [T, H, W] luma video.
Implemented as two depthwise 1-D convolutions (lax.conv_general_dilated) —
XLA maps these onto the TPU's convolution path directly; the op sits OFF
the hot path (it runs only when the adaptive tracker escalates to a
denoised re-track, tdspa/features/tracks.py::_maybe_denoise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gauss_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(x / sigma))
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_blur_video(video, sigma: float = 3.0, truncate: float = 3.0):
    """Gaussian-blur each frame of a [T, H, W] video (any float scale).

    ``truncate``: kernel support in standard deviations (radius =
    round(truncate * sigma)); symmetric (edge-duplicating) padding at the
    borders — scipy.ndimage.gaussian_filter's 'reflect' — so constant
    regions stay exactly constant.
    """
    video = jnp.asarray(video, jnp.float32)
    t, h, w = video.shape
    # scipy's radius convention (int(t*s + 0.5), not banker's rounding).
    radius = int(truncate * float(sigma) + 0.5)
    k = _gauss_kernel1d(float(sigma), radius)

    # Depthwise separable passes: frames ride the batch dim, one channel.
    x = video[:, jnp.newaxis]  # [T, 1, H, W]
    x = jnp.pad(
        x, ((0, 0), (0, 0), (radius, radius), (0, 0)), mode="symmetric"
    )
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, -1, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = jnp.pad(
        x, ((0, 0), (0, 0), (0, 0), (radius, radius)), mode="symmetric"
    )
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, 1, -1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return x[:, 0]
