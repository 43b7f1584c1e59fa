"""Golden regression tests: fixed-seed tiny models vs stored outputs.

Regenerate after an *intentional* numerics change:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tests/golden/generate_goldens.py
"""

import os

import jax
import numpy as np

from tests.golden.generate_goldens import GOLDEN_PATH, compute_goldens


def test_golden_outputs_unchanged():
    assert os.path.exists(GOLDEN_PATH), (
        "goldens missing; run tests/golden/generate_goldens.py"
    )
    stored = np.load(GOLDEN_PATH)
    current = compute_goldens()
    assert set(stored.files) == set(current.keys())
    for key in current:
        np.testing.assert_allclose(
            stored[key], current[key], atol=1e-5,
            err_msg=f"golden mismatch: {key}",
        )
