"""End-to-end inference pipeline on synthetic video with fake front-ends."""

import numpy as np
import jax
import pytest

from tdspa.features.depth import ConstantDepthProvider
from tdspa.features.tracks import StaticGridProvider, make_query_grid
from tdspa.infer.pipeline import InferencePipeline, save_results
from tdspa.utils.testing import tiny_model_3d

T = 10


def _video(t=T, h=32, w=40):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (t, h, w, 3)).astype(np.uint8)


def test_make_query_grid_reference_layout():
    grid = make_query_grid(height=8, width=16, grid_size=2)
    # Row-major over (i=y, j=x): [(0.5*8, 0.5*4), (1.5*8, 0.5*4), ...]
    np.testing.assert_allclose(
        grid, [[4.0, 2.0], [12.0, 2.0], [4.0, 6.0], [12.0, 6.0]]
    )


@pytest.fixture(scope="module")
def pipeline():
    model = tiny_model_3d(T, use_dino=False, use_depth=True)
    return InferencePipeline(
        num_output_frames=T,
        use_dino=False,
        use_depth=True,
        num_query_points=6,
        num_support_tracks=10,
        track_provider=StaticGridProvider(grid_size=4),  # 16 tracks
        depth_provider=ConstantDepthProvider(),
        model=model,
    )


def test_pipeline_end_to_end(pipeline, tmp_path_factory):
    video = _video()
    results = pipeline.run_on_frames(video)
    preds = results["predictions"]
    assert preds.tracks.shape == (1, 6, T, 3)
    assert preds.visible_logits.shape == (1, 6, T, 1)
    assert np.isfinite(np.asarray(preds.tracks)).all()
    assert results["tracks_3d"].shape == (16, T, 3)
    # Unit depth + static tracks: z == 1 everywhere.
    np.testing.assert_allclose(results["tracks_3d"][..., 2], 1.0, atol=1e-6)
    assert set(results["timings"]) >= {"tracking", "depth", "fused_tail"}

    out_dir = tmp_path_factory.mktemp("out")
    save_results(results, str(out_dir))
    data = np.load(out_dir / "predictions.npz")
    assert set(data.files) == {
        "tracks_3d", "visible_logits", "query_tracks", "support_tracks",
    }
    assert data["tracks_3d"].shape == (6, T, 3)
    info = (out_dir / "video_info.txt").read_text()
    assert "FPS:" in info and "Query points: 6" in info


def test_pipeline_deterministic_split(pipeline):
    video = _video()
    r1 = pipeline.run_on_frames(video)
    r2 = pipeline.run_on_frames(video)
    np.testing.assert_array_equal(
        np.asarray(r1["predictions"].tracks), np.asarray(r2["predictions"].tracks)
    )


def test_pipeline_tail_artifact_matches_live(pipeline, tmp_path_factory):
    """InferencePipeline(tail_artifact=...) reproduces the live tail
    exactly (same program through the AOT roundtrip, same seed fold)."""
    from tdspa.infer.export import export_serving_tail, save_exported

    video = _video()
    live = pipeline.run_on_frames(video)
    if pipeline.params is None:  # populated by the first run
        raise AssertionError("pipeline should have params after a run")

    path = str(tmp_path_factory.mktemp("aot") / "tail.shlo")
    t, h, w = video.shape[:3]
    exported = export_serving_tail(
        pipeline.model, pipeline.params,
        num_tracks=16, num_frames=t, video_hw=(h, w),
        num_support=10, num_queries=6,
        use_dino=False, use_depth=True,
    )
    save_exported(exported, path)

    aot = InferencePipeline(
        num_output_frames=T,
        use_dino=False,
        use_depth=True,
        num_query_points=6,
        num_support_tracks=10,
        track_provider=StaticGridProvider(grid_size=4),
        depth_provider=ConstantDepthProvider(),
        model=pipeline.model,
        params=pipeline.params,
        tail_artifact=path,
    )
    got = aot.run_on_frames(video)
    np.testing.assert_array_equal(
        np.asarray(got["predictions"].tracks),
        np.asarray(live["predictions"].tracks),
    )
    np.testing.assert_array_equal(
        np.asarray(got["predictions"].visible_logits),
        np.asarray(live["predictions"].visible_logits),
    )
    np.testing.assert_array_equal(
        np.asarray(got["query_tracks"]), np.asarray(live["query_tracks"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["support_tracks"]), np.asarray(live["support_tracks"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["tracks_3d"]), np.asarray(live["tracks_3d"])
    )


def test_pipeline_lift_matches_host_op(pipeline):
    """Fused-tail lifting equals the standalone geometry op."""
    from tdspa.ops.geometry import lift_2d_to_3d
    import jax.numpy as jnp

    video = _video()
    results = pipeline.run_on_frames(video)
    tracks_2d = StaticGridProvider(grid_size=4)(video)["tracks"]
    depth = ConstantDepthProvider()(video)
    expected = np.asarray(lift_2d_to_3d(jnp.asarray(tracks_2d), jnp.asarray(depth)))
    np.testing.assert_allclose(results["tracks_3d"], expected, atol=1e-5)


def test_streamed_branch_matches_unstreamed():
    """The TPU streamed path (chunked upload -> per-chunk track/dino/depth)
    must equal the plain path. Only runs on TPU in production, so this
    drives it on CPU with the Pallas tracker in interpret mode; chunk size
    8 aligns with the depth estimator's temporal groups and the edge-
    replicated padding makes per-chunk groups bitwise-identical to the
    full-video grouping."""
    import jax.numpy as jnp

    from tdspa.features.depth import VideoDepthEstimator
    from tdspa.features.dino import DinoFeatureExtractor
    from tdspa.features.tracks import PyramidalLKTracker
    from tdspa.features.vit import ViTConfig
    from tdspa.kernels.lk import track_video_lk_pallas

    class InterpretLK(PyramidalLKTracker):
        def prefers_device_input(self, shape):
            return True

        def __call__(self, video):
            t, h, w = video.shape[:3]
            tr, vi = track_video_lk_pallas(
                jnp.asarray(video),
                jnp.asarray(make_query_grid(h, w, self.grid_size)),
                num_levels=self.num_levels, window=self.window,
                iterations=self.iterations, fb_threshold=self.fb_threshold,
                ncc_threshold=self.ncc_threshold,
                template_ncc_threshold=self.template_ncc_threshold,
                interpret=True,
            )
            return {"tracks": tr, "visible": vi}

        def track_chunks(self, chunks, interpret=True):
            return super().track_chunks(chunks, interpret=True)

    class TinyDepth(VideoDepthEstimator):
        def __call__(self, video, input_size: int = 28):
            return super().__call__(video, input_size=input_size)

    vit_config = ViTConfig(hidden_size=32, num_layers=4, num_heads=2,
                           patch_size=14, image_size=28)
    depth = TinyDepth(
        encoder="vitb", dtype=jnp.float32, vit_config=vit_config,
        head_cfg={"features": 16, "out_channels": [8, 16, 24, 32],
                  "layer_idxs": [0, 1, 2, 3]},
    )
    dino = DinoFeatureExtractor(model_name="nonexistent/tiny")  # random init
    tracker = InterpretLK(grid_size=4, num_levels=1)
    model = tiny_model_3d(T, use_dino=True, use_depth=True)
    common = dict(
        num_output_frames=T, use_dino=True, use_depth=True,
        num_query_points=6, num_support_tracks=10,
        track_provider=tracker, dino_extractor=dino, depth_provider=depth,
        model=model, upload_yuv420=False, seed=0,
    )
    video = _video(t=T, h=32, w=40)

    streamed = InferencePipeline(upload_chunk_frames=8, **common)
    r_streamed = streamed.run_on_frames(video)
    assert "upload_tracking_features" in r_streamed["timings"]

    plain = InferencePipeline(upload_chunk_frames=0, **common)
    r_plain = plain.run_on_frames(video)
    assert "tracking" in r_plain["timings"]

    np.testing.assert_allclose(
        np.asarray(r_streamed["predictions"].tracks),
        np.asarray(r_plain["predictions"].tracks),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(r_streamed["tracks_3d"]),
        np.asarray(r_plain["tracks_3d"]),
        atol=1e-4,
    )

    # YUV wire encoding on: the branch runs and stays finite (fidelity is
    # covered by tests/unit/test_yuv.py; chroma loss shifts features
    # slightly, so no exact comparison here).
    yuv = InferencePipeline(
        upload_chunk_frames=8, **{**common, "upload_yuv420": True}
    )
    r_yuv = yuv.run_on_frames(video)
    assert np.isfinite(np.asarray(r_yuv["predictions"].tracks)).all()


def test_pipeline_quantized_model_runs():
    """quantize plumbs to the internally-built model, and a quantized model
    runs the pipeline end-to-end with finite outputs."""
    assert InferencePipeline(quantize=True).model.quantize is True

    model = tiny_model_3d(T, use_dino=False, use_depth=True, quantize=True)
    pipe = InferencePipeline(
        num_output_frames=T,
        use_dino=False,
        use_depth=True,
        num_query_points=6,
        num_support_tracks=10,
        track_provider=StaticGridProvider(grid_size=4),
        depth_provider=ConstantDepthProvider(),
        model=model,
    )
    preds = pipe.run_on_frames(_video())["predictions"]
    assert preds.tracks.shape == (1, 6, T, 3)
    assert np.isfinite(np.asarray(preds.tracks)).all()


def test_pipeline_tracking_input_scale_knob():
    """The half-res tracking serving knob plumbs through the pipeline: the
    lazily-built LK tracker carries input_scale, and a run produces finite,
    full-res-coordinate outputs on a moving synthetic scene."""
    from tdspa.utils.synthetic_video import make_tracking_scene

    video, _, _ = make_tracking_scene(
        seed=3, num_frames=T, height=160, width=256, grid_size=4
    )
    model = tiny_model_3d(T, use_dino=False, use_depth=True)
    pipe = InferencePipeline(
        num_output_frames=T,
        use_dino=False,
        use_depth=True,
        num_query_points=6,
        num_support_tracks=8,
        tracking_grid_size=4,
        depth_provider=ConstantDepthProvider(),
        model=model,
        tracking_input_scale=0.5,
    )
    assert pipe.track_provider.input_scale == 0.5
    results = pipe.run_on_frames(video)
    assert np.isfinite(np.asarray(results["tracks_3d"])).all()
    # Full-res pixel coordinates out of the tracker: the 4x4 grid spans the
    # 256-wide frame (max center 224), not the 128-wide half-res one.
    track_out = pipe.track_provider(video)
    assert np.asarray(track_out["tracks"])[..., 0].max() > 129.0
