"""Gaussian blur op (tdspa/ops/filters.py) vs the scipy oracle."""

import numpy as np
import pytest

from tdspa.ops.filters import gaussian_blur_video

scipy_ndimage = pytest.importorskip("scipy.ndimage")


@pytest.mark.parametrize("sigma", [1.5, 3.0])
def test_matches_scipy(sigma):
    x = np.random.RandomState(0).rand(3, 40, 56).astype(np.float32) * 255
    got = np.asarray(gaussian_blur_video(x, sigma=sigma))
    ref = scipy_ndimage.gaussian_filter(
        x, (0, sigma, sigma), truncate=3.0, mode="reflect"
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-2)


def test_constant_preserved():
    x = np.full((2, 32, 48), 117.0, np.float32)
    got = np.asarray(gaussian_blur_video(x, sigma=3.0))
    np.testing.assert_allclose(got, x, rtol=0, atol=1e-3)
