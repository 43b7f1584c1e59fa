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


def test_depth_output_scale():
    """output_scale < 1 keeps the output contract (shape/range), stays close
    to the exact head on smooth content, and rejects bad values."""
    import pytest
    import jax.numpy as jnp
    from tdspa.features.vit import Dinov2Flax, ViTConfig
    from tdspa.features.depth import DPTHead

    def make(scale):
        est = VideoDepthEstimator(
            encoder="vits", use_temporal=True, frame_chunk=2,
            output_scale=scale,
        )
        est.vit_config = ViTConfig(
            hidden_size=32, num_layers=4, num_heads=2, patch_size=14,
            image_size=28,
        )
        est.backbone = Dinov2Flax(config=est.vit_config)
        est.layer_idxs = (0, 1, 2, 3)
        est.head = DPTHead(features=16, out_channels=[8, 16, 24, 32])
        est.init_params(jax.random.PRNGKey(0), sample_hw=(56, 56))
        return est

    video = (np.random.default_rng(1).uniform(0, 255, (3, 60, 44, 3))).astype(
        np.uint8
    )

    full_est = make(1.0)
    half = np.asarray(make(0.5)(video, input_size=56))
    assert half.shape == (3, 60, 44, 1)
    assert (half >= 0).all() and np.isfinite(half).all()

    # Oracle: the exact estimator's head applied at half resolution, then
    # the 1-channel depth bilinearly upsampled — same params, same
    # preprocessing (init_matcher keys match across make() calls).
    from tdspa.features.dino import IMAGENET_MEAN, IMAGENET_STD

    t, h, w = video.shape[:3]
    p = full_est.vit_config.patch_size
    s = 56 / max(h, w)
    th = max(int(round(h * s / p)) * p, p)
    tw = max(int(round(w * s / p)) * p, p)
    x = jnp.asarray(video, jnp.float32) / 255.0
    x = jax.image.resize(x, (t, th, tw, 3), method="bilinear")
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    pad = (-t) % full_est.frame_chunk
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
    groups = x.reshape((-1, full_est.frame_chunk) + x.shape[1:])
    outs = []
    for i in range(groups.shape[0]):
        g = groups[i]
        taps = full_est._taps(full_est.params["backbone"], g)
        _, gh, gw, _ = g.shape
        outs.append(full_est.head.apply(
            {"params": full_est.params["head"]}, taps,
            (gh // p, gw // p), (int(round(gh * 0.5)), int(round(gw * 0.5))),
        ))
    d = jnp.concatenate(outs, axis=0)[:t]
    oracle = np.asarray(
        jax.image.resize(d, (t, h, w, 1), method="bilinear")
    )
    np.testing.assert_allclose(half, oracle, rtol=2e-4, atol=2e-5)

    with pytest.raises(ValueError):
        VideoDepthEstimator(encoder="vits", output_scale=0.0)
    with pytest.raises(ValueError):
        VideoDepthEstimator(encoder="vits", output_scale=1.5)


def test_depth_input_size():
    """Constructor input_size is the __call__ default (serving knob): same
    output contract, exactly equal to passing the size per call, and bad
    values rejected up front."""
    import pytest
    from tdspa.features.vit import Dinov2Flax, ViTConfig
    from tdspa.features.depth import DPTHead

    def make(**kw):
        est = VideoDepthEstimator(
            encoder="vits", use_temporal=True, frame_chunk=2, **kw
        )
        est.vit_config = ViTConfig(
            hidden_size=32, num_layers=4, num_heads=2, patch_size=14,
            image_size=28,
        )
        est.backbone = Dinov2Flax(config=est.vit_config)
        est.layer_idxs = (0, 1, 2, 3)
        est.head = DPTHead(features=16, out_channels=[8, 16, 24, 32])
        est.init_params(jax.random.PRNGKey(0), sample_hw=(56, 56))
        return est

    video = (np.random.default_rng(2).uniform(0, 255, (3, 60, 44, 3))).astype(
        np.uint8
    )
    small = np.asarray(make(input_size=42)(video))
    assert small.shape == (3, 60, 44, 1)
    assert (small >= 0).all() and np.isfinite(small).all()
    # The constructor default and an explicit per-call size are one path.
    per_call = np.asarray(make(input_size=518)(video, input_size=42))
    np.testing.assert_array_equal(small, per_call)
    # Smaller backbone input actually changes the prediction (the knob is
    # live, not a no-op resize).
    full = np.asarray(make(input_size=56)(video))
    assert np.abs(small - full).max() > 0

    with pytest.raises(ValueError):
        VideoDepthEstimator(encoder="vits", input_size=7)


def test_vda_configs_match_reference():
    # Channel tables from reference inference.py:236-240.
    assert VDA_MODEL_CONFIGS["vitb"]["features"] == 128
    assert VDA_MODEL_CONFIGS["vitb"]["out_channels"] == [96, 192, 384, 768]
    assert VDA_MODEL_CONFIGS["vits"]["out_channels"] == [48, 96, 192, 384]
    assert VDA_MODEL_CONFIGS["vitl"]["out_channels"] == [256, 512, 1024, 1024]
