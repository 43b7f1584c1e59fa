"""Depth estimator: shapes, tap capture, constant provider."""

import numpy as np
import jax

from tdspa.features.depth import (
    ConstantDepthProvider,
    VideoDepthEstimator,
    VDA_MODEL_CONFIGS,
)


def test_constant_depth_provider():
    video = np.zeros((3, 16, 20, 3), np.uint8)
    d = ConstantDepthProvider()(video)
    assert d.shape == (3, 16, 20, 1)
    assert (d == 1.0).all()


def test_depth_estimator_shapes_tiny():
    est = VideoDepthEstimator(encoder="vits", use_temporal=True, frame_chunk=2)
    # Override to a tiny backbone for test speed.
    from tdspa.features.vit import Dinov2Flax, ViTConfig
    from tdspa.features.depth import DPTHead
    import jax.numpy as jnp

    est.vit_config = ViTConfig(
        hidden_size=32, num_layers=4, num_heads=2, patch_size=14, image_size=28
    )
    est.backbone = Dinov2Flax(config=est.vit_config)
    est.layer_idxs = (0, 1, 2, 3)
    est.head = DPTHead(features=16, out_channels=[8, 16, 24, 32])
    est.init_params(jax.random.PRNGKey(0), sample_hw=(56, 56))

    video = (np.random.default_rng(0).uniform(0, 255, (3, 60, 44, 3))).astype(
        np.uint8
    )
    depth = est(video, input_size=56)
    assert depth.shape == (3, 60, 44, 1)
    assert (depth >= 0).all()
    assert np.isfinite(depth).all()


def test_vda_configs_match_reference():
    # Channel tables from reference inference.py:236-240.
    assert VDA_MODEL_CONFIGS["vitb"]["features"] == 128
    assert VDA_MODEL_CONFIGS["vitb"]["out_channels"] == [96, 192, 384, 768]
    assert VDA_MODEL_CONFIGS["vits"]["out_channels"] == [48, 96, 192, 384]
    assert VDA_MODEL_CONFIGS["vitl"]["out_channels"] == [256, 512, 1024, 1024]
