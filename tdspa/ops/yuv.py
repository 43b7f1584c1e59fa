"""YUV 4:2:0 transport encoding for host->HBM video upload.

Video files store chroma-subsampled YUV 4:2:0; decoding to RGB on the host
inflates the pixels 2x before they ever reach the chip. On a
transport-bound link (the reference-scale 150x512x512 clip is 118 MB of
RGB), re-encoding to 4:2:0 for the wire and reconstructing RGB on device
halves upload time for the fidelity the source footage already had:

* ``rgb_to_yuv420`` (host, numpy): full-resolution luma Y (BT.601 weights —
  identical to the LK tracker's grayscale, so tracking sees lossless input)
  plus 2x2-mean-pooled chroma planes.
* ``yuv420_to_rgb`` (device, jit): exact inverse of the encode matrix with
  nearest-neighbor chroma upsampling.

Round-trip error is bounded by chroma smoothness (exact luma; see
tests/unit/test_yuv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# Full-range BT.601: Y in [0,255]; U = (B-Y)*0.564 + 128; V = (R-Y)*0.713
# + 128 expanded into per-channel coefficients.
_ENCODE = np.array(
    [
        [0.299, 0.587, 0.114, 0.0],
        [-0.299 * 0.564, -0.587 * 0.564, (1 - 0.114) * 0.564, 128.0],
        [(1 - 0.299) * 0.713, -0.587 * 0.713, -0.114 * 0.713, 128.0],
    ],
    np.float32,
)


def rgb_to_yuv420(rgb: np.ndarray):
    """[T H W 3] uint8 RGB -> (y [T H W], u [T H/2 W/2], v [T H/2 W/2]) uint8.

    H and W must be even. BT.601 full-range luma; chroma differences scaled
    into [0, 255] around 128 and 2x2 mean-pooled. Uses OpenCV's SIMD
    primitives when available (~10x faster than the numpy fallback —
    encode speed is on the upload critical path).
    """
    t, h, w = rgb.shape[:3]
    if h % 2 or w % 2:
        raise ValueError(f"YUV420 needs even dimensions, got {h}x{w}")
    try:
        import cv2

        ys = np.empty((t, h, w), np.uint8)
        us = np.empty((t, h // 2, w // 2), np.uint8)
        vs = np.empty((t, h // 2, w // 2), np.uint8)
        for i in range(t):
            yuv = cv2.transform(rgb[i], _ENCODE)  # uint8, saturating round
            ys[i] = yuv[..., 0]
            us[i] = cv2.resize(yuv[..., 1], (w // 2, h // 2),
                               interpolation=cv2.INTER_AREA)
            vs[i] = cv2.resize(yuv[..., 2], (w // 2, h // 2),
                               interpolation=cv2.INTER_AREA)
        return ys, us, vs
    except ImportError:
        pass
    f = rgb.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * 0.564 + 128.0
    v = (r - y) * 0.713 + 128.0

    def pool(c):
        return c.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    to8 = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(pool(u)), to8(pool(v))


@jax.jit
def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``rgb_to_yuv420`` -> [T H W 3] uint8 RGB (device)."""
    yf = jnp.asarray(y, jnp.float32)
    uf = jnp.repeat(jnp.repeat(jnp.asarray(u, jnp.float32), 2, -2), 2, -1) - 128.0
    vf = jnp.repeat(jnp.repeat(jnp.asarray(v, jnp.float32), 2, -2), 2, -1) - 128.0
    r = yf + vf / 0.713
    b = yf + uf / 0.564
    g = (yf - 0.299 * r - 0.114 * b) / 0.587
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
