"""YUV 4:2:0 transport codec round trip."""

import numpy as np

from tdspa.ops.yuv import rgb_to_yuv420, yuv420_to_rgb


def _roundtrip(rgb):
    y, u, v = rgb_to_yuv420(rgb)
    assert y.shape == rgb.shape[:3] and y.dtype == np.uint8
    assert u.shape == (rgb.shape[0], rgb.shape[1] // 2, rgb.shape[2] // 2)
    return np.asarray(yuv420_to_rgb(y, u, v))


def test_luma_is_lossless_tracking_gray():
    """The Y plane equals the LK tracker's BT.601 grayscale (x255)."""
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    y, _, _ = rgb_to_yuv420(rgb)
    f = rgb.astype(np.float32)
    expected = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    np.testing.assert_allclose(y.astype(np.float32), np.round(expected), atol=1.01)


def test_roundtrip_smooth_content():
    """Chroma-smooth content (real video statistics) round-trips tightly."""
    h = w = 32
    gx = np.linspace(0, 255, w, dtype=np.float32)
    gy = np.linspace(255, 0, h, dtype=np.float32)
    rgb = np.stack(
        [
            np.tile(gx, (h, 1)),
            np.tile(gy[:, None], (1, w)),
            np.full((h, w), 90.0),
        ],
        axis=-1,
    )[None].astype(np.uint8)
    out = _roundtrip(rgb)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 8


def test_roundtrip_constant_color_exact():
    rgb = np.full((1, 8, 8, 3), 200, np.uint8)
    rgb[..., 1] = 37
    out = _roundtrip(rgb)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


def test_odd_dimensions_rejected():
    import pytest

    with pytest.raises(ValueError):
        rgb_to_yuv420(np.zeros((1, 7, 8, 3), np.uint8))
