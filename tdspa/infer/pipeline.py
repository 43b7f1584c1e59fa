"""End-to-end single-video inference: video -> 3D track predictions.

Reference call chain (inference.py:511-635): load video -> CoTracker 2D
tracks -> DINOv2 features -> VDA depth -> *host* NumPy loops for lifting /
feature sampling -> np.random support/query split -> model forward.

TPU-native restructuring: the three neural front-ends run as batched XLA
forwards (providers, each pluggable), and everything after them — 2D->3D
lifting, bilinear feature sampling, the support/query split, query-point
sampling, and the autoencoder forward — is ONE jitted program
(``fused_tail``). The ~1.2M-iteration host loops of the reference become
dense gathers on device; the split uses a ``jax.random`` key (reproducible;
RNG contract documented in data/batch_prep.py).

Output schema (predictions.npz + video_info.txt) matches the reference
(inference.py:638-660).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from tdspa.data.batch_prep import split_and_sample_queries
from tdspa.infer.checkpoint import check_params_structure, load_checkpoint
from tdspa.infer.video import load_video
from tdspa.models import TrackAutoEncoder3D
from tdspa.ops.geometry import (
    lift_2d_to_3d,
    sample_depth_features_for_tracks,
    sample_dino_features_for_tracks,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "num_support", "num_queries", "video_hw", "use_dino", "use_depth",
    ),
)
def fused_tail(
    params,
    tracks_2d,  # [N T 2]
    visible,  # [N T 1]
    dino_grid,  # [T Hp Wp D] | None
    depth_maps,  # [T H W 1] | None
    key,
    model,
    num_support: int,
    num_queries: int,
    video_hw: tuple,
    use_dino: bool = True,
    use_depth: bool = True,
):
    """Lift + sample + split + autoencode in one on-device program."""
    num_frames = tracks_2d.shape[1]
    if use_depth and depth_maps is not None:
        tracks_3d = lift_2d_to_3d(tracks_2d, depth_maps)
    else:
        tracks_3d = jnp.concatenate(
            [tracks_2d, jnp.ones(tracks_2d.shape[:-1] + (1,))], axis=-1
        )

    dino_feats = (
        sample_dino_features_for_tracks(
            dino_grid, tracks_2d, (num_frames,) + tuple(video_hw) + (3,)
        )
        if use_dino and dino_grid is not None
        else None
    )
    depth_feats = (
        sample_depth_features_for_tracks(depth_maps, tracks_2d)
        if use_depth and depth_maps is not None
        else None
    )

    batch = split_and_sample_queries(
        key,
        tracks_3d,
        visible,
        num_support=num_support,
        num_queries=num_queries,
        num_frames=num_frames,
        dino_features=dino_feats,
        depth_features=depth_feats,
    )
    predictions = model.apply({"params": params}, batch)
    return predictions, batch, tracks_3d


def make_mesh_tail(
    mesh,
    model,
    num_support: int,
    num_queries: int,
    video_hw: tuple,
    use_dino: bool = True,
    use_depth: bool = True,
):
    """Mesh-sharded fused tail: the multi-chip decode path.

    Parallelism layout (SURVEY §2.7 — Q/N set-sharding is this model's
    SP/CP): the raw track set shards over every mesh axis jointly; after the
    support/query split both sets keep that layout
    (``query_sharded_batch_spec``), so each device encodes its slice of
    tracks (XLA all-gathers/psums the latents' cross-attention over the
    track set) and decodes its slice of queries against replicated latents.
    Params and the per-frame feature grids are replicated. Fused Pallas
    attention stays engaged under the mesh: the kernels declare batch-axis
    partitioning via ``custom_partitioning`` (tdspa/kernels/attention.py),
    so each device runs them on its track/query shard.

    Returns a jitted ``tail(params, tracks_2d, visible, dino_grid,
    depth_maps, key)`` -> (predictions, batch, tracks_3d).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdspa.parallel.shardings import query_sharded_batch_spec

    repl = NamedSharding(mesh, P())
    track_set = NamedSharding(mesh, P(("data", "seq")))
    specs = query_sharded_batch_spec()

    def tail(params, tracks_2d, visible, dino_grid, depth_maps, key):
        num_frames = tracks_2d.shape[1]
        if use_depth and depth_maps is not None:
            tracks_3d = lift_2d_to_3d(tracks_2d, depth_maps)
        else:
            tracks_3d = jnp.concatenate(
                [tracks_2d, jnp.ones(tracks_2d.shape[:-1] + (1,))], axis=-1
            )
        dino_feats = (
            sample_dino_features_for_tracks(
                dino_grid, tracks_2d, (num_frames,) + tuple(video_hw) + (3,)
            )
            if use_dino and dino_grid is not None
            else None
        )
        depth_feats = (
            sample_depth_features_for_tracks(depth_maps, tracks_2d)
            if use_depth and depth_maps is not None
            else None
        )
        batch = split_and_sample_queries(
            key,
            tracks_3d,
            visible,
            num_support=num_support,
            num_queries=num_queries,
            num_frames=num_frames,
            dino_features=dino_feats,
            depth_features=depth_feats,
        )
        batch = {
            k: (
                jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, specs[k])
                )
                if k in specs
                else v
            )
            for k, v in batch.items()
        }
        predictions = model.apply({"params": params}, batch)
        return predictions, batch, tracks_3d

    return jax.jit(
        tail,
        in_shardings=(repl, track_set, track_set, repl, repl, repl),
        out_shardings=(repl, None, None),
    )


class InferencePipeline:
    """Configured end-to-end pipeline with pluggable front-ends."""

    def __init__(
        self,
        checkpoint_path: str | None = None,
        params=None,
        num_output_frames: int = 150,
        use_dino: bool = True,
        use_depth: bool = True,
        num_query_points: int = 512,
        num_support_tracks: int = 2048,
        tracking_grid_size: int = 64,
        dino_model: str = "facebook/dinov2-base",
        vda_encoder: str = "vitb",
        track_provider=None,
        dino_extractor=None,
        depth_provider=None,
        model: Any = None,
        seed: int = 0,
        dtype=jnp.bfloat16,
        mesh=None,
        upload_chunk_frames: int = 40,
        upload_yuv420: bool = True,
        projection_policy: str = "error",
        quantize: bool = False,
        residual_dtype=None,
        depth_output_scale: float = 1.0,
        depth_input_size: int = 518,
        gelu_approximate: bool = False,
        tracking_input_scale: float = 1.0,
        fused_block: bool = False,
        tail_artifact: str | None = None,
    ):
        self.num_output_frames = num_output_frames
        self.use_dino = use_dino
        self.use_depth = use_depth
        self.num_query_points = num_query_points
        self.num_support_tracks = num_support_tracks
        self.tracking_grid_size = tracking_grid_size
        self.dino_model_name = dino_model
        self.vda_encoder = vda_encoder
        self.seed = seed
        self.mesh = mesh
        # Chunk size for streamed host->HBM upload. Multiples of 8 keep the
        # depth extractor's temporal-attention windows aligned with the
        # unchunked grouping (its lax.map groups are 8 frames).
        self.upload_chunk_frames = upload_chunk_frames
        self.upload_yuv420 = upload_yuv420
        # Applied to the model's transformer stacks AND the lazily-built
        # DINOv2/VDA backbones (explicitly-passed providers keep their own).
        self.residual_dtype = residual_dtype or jnp.float32
        # < 1.0 runs the DPT head's HBM-bound full-res tail at reduced
        # resolution (approximate; see VideoDepthEstimator.output_scale).
        self.depth_output_scale = depth_output_scale
        # < 518 feeds the VDA backbone a smaller resize of each frame (the
        # backbone dominates the depth stage and scales ~quadratically with
        # side length — approximate; see VideoDepthEstimator.input_size).
        self.depth_input_size = depth_input_size
        # tanh GELU in the lazily-built DINOv2/VDA backbones (-17.5%
        # measured on the DINO stage; ~1e-3 relative activation delta —
        # serving knob, see tdspa/features/vit.py::_Block).
        self.gelu_approximate = gelu_approximate
        # 0.5 runs the LK tracker on half-resolution luma (drops the finest
        # pyramid level's share of the kernel; serving knob — measured
        # time/quality curve in docs/BENCHMARKS.md "Tracking input-scale
        # knob"). Coordinates stay full-res throughout the pipeline.
        self.tracking_input_scale = tracking_input_scale
        self.model = model or TrackAutoEncoder3D(
            num_output_frames=num_output_frames,
            use_dino=use_dino,
            use_depth=use_depth,
            dtype=dtype,
            # The fused Pallas kernel computes in bf16; only engage it when
            # bf16 compute was requested (and only on TPU — see the gate in
            # core/attention.py). An explicit f32 pipeline stays f32. The
            # kernels are SPMD-capable (custom_partitioning over the batch
            # axis, tdspa/kernels/attention.py), so the mesh path keeps them.
            fused_attention=(dtype == jnp.bfloat16),
            # int8 dynamic quantization of projection/MLP matmuls (same
            # param tree; tdspa/core/quant.py) — inference-only FLOP cut.
            quantize=quantize,
            # bf16 residual stream halves the decoder's elementwise/HBM
            # traffic (the profiled non-matmul floor — docs/BENCHMARKS.md
            # "Residual dtype"); default keeps the reference's f32 residual.
            residual_dtype=self.residual_dtype,
            # Whole-block Pallas kernel for the unmasked self-attention
            # stacks (decode hot path) — inference-only serving knob
            # (docs/BENCHMARKS.md "Fused transformer-block kernel").
            fused_block=fused_block,
        )
        self._mesh_tail = None
        # Path to a pre-exported AOT artifact of the fused tail
        # (tdspa.infer.export / `tdspa-export`): skips the tail's trace at
        # startup and dispatches the deserialized program instead. The
        # artifact's traced shapes/config must match this pipeline's
        # operating point (jax.export checks and raises otherwise).
        self.tail_artifact = tail_artifact
        self._artifact_tail = None
        self._track_provider = track_provider
        self._dino_extractor = dino_extractor
        self._depth_provider = depth_provider
        self.params = params
        self.checkpoint_path = checkpoint_path
        self.projection_policy = projection_policy
        self.timings: dict[str, float] = {}

    # Lazy front-ends (each may pull weights / build jit programs).
    @property
    def track_provider(self):
        if self._track_provider is None:
            from tdspa.features.tracks import PyramidalLKTracker

            # Fast configuration: NCC occlusion checks instead of the
            # backward pass (halves kernel cost at ~1% occlusion-recall on
            # the tracking-quality benchmark), and 3 LK iterations — with
            # the velocity-prior warm start, quality at 3 equals 4 on every
            # benchmark regime (static/pan/degraded; degraded even improves
            # slightly) while cutting per-iteration kernel work. 'auto' is
            # the adaptive quality policy: photometrically degraded content
            # engages the learned matcher (pts2 0.71-0.74 -> 0.92-0.96
            # where classical LK+NCC collapses), and a collapsed classical
            # pass (occluded-marking > AUTO_LK_OCCLUDED_FRAC, e.g. fast
            # pan with clean-looking frames) escalates to a cost-volume
            # rescue re-track (pts2 0.31 -> 0.72 on pan). Clean/affine
            # content stays on the single classical pass
            # (tdspa/features/{matcher,tracks}.py thresholds).
            self._track_provider = PyramidalLKTracker(
                grid_size=self.tracking_grid_size, fb_threshold=-1.0,
                iterations=3, matcher="auto",
                input_scale=self.tracking_input_scale,
            )
        return self._track_provider

    @property
    def dino_extractor(self):
        if self._dino_extractor is None:
            from tdspa.features.dino import DinoFeatureExtractor

            self._dino_extractor = DinoFeatureExtractor(
                model_name=self.dino_model_name,
                residual_dtype=self.residual_dtype,
                gelu_approximate=self.gelu_approximate,
            )
        return self._dino_extractor

    @property
    def depth_provider(self):
        if self._depth_provider is None:
            from tdspa.features.depth import VideoDepthEstimator

            self._depth_provider = VideoDepthEstimator(
                encoder=self.vda_encoder,
                residual_dtype=self.residual_dtype,
                output_scale=self.depth_output_scale,
                input_size=self.depth_input_size,
                gelu_approximate=self.gelu_approximate,
            )
        return self._depth_provider

    def load_params(self, example_batch):
        """Checkpoint load + structure validation (inference.py:601-619)."""
        init_params = jax.jit(self.model.init)(
            jax.random.PRNGKey(42), example_batch
        )["params"]
        if self.params is not None:
            params = self.params
        elif self.checkpoint_path:
            params = load_checkpoint(
                self.checkpoint_path, self.model,
                projection_policy=self.projection_policy,
                track_token_dim=getattr(self.model, "track_token_dim", 384),
            )
        else:
            logging.warning("No checkpoint given; using randomly initialized params")
            self.params = init_params
            return init_params
        problems = check_params_structure(init_params, params)
        if problems:
            logging.warning(
                "Checkpoint structure mismatches (%d): %s",
                len(problems),
                "; ".join(problems[:5]),
            )
        self.params = params
        return params

    def _timed(self, name, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        # Fetch a host value per device array (incl. dict results, e.g. the
        # tracker's {tracks, visible}): forces completion even on
        # remote-tunnel platforms where block_until_ready returns at
        # enqueue. Without this a dict-returning stage's compute silently
        # leaks into the NEXT stage's timing. A device-side sum (not
        # ravel/index) — indexing a tiled array can force a full relayout
        # copy, catastrophically padded for trailing dims < 128 (42x for
        # a [T, H, W, 3] frame stack).
        for leaf in jax.tree.leaves(out):
            if isinstance(leaf, jax.Array):
                float(jnp.sum(leaf.astype(jnp.float32)))
        self.timings[name] = time.perf_counter() - t0
        logging.info("%s: %.3fs", name, self.timings[name])
        return out

    def run_on_frames(self, video: np.ndarray, fps: float = 30.0) -> dict:
        """Full pipeline on an in-memory [T H W 3] uint8 video."""
        t, h, w = video.shape[:3]
        wants_dev = getattr(self.track_provider, "prefers_device_input", None)
        on_device_tracker = bool(wants_dev and wants_dev(video.shape))
        chunk = self.upload_chunk_frames
        dino_grid = None
        depth_maps = None
        if (
            on_device_tracker
            and hasattr(self.track_provider, "track_chunks")
            and chunk
            and t > chunk
        ):
            # Streamed upload: chunk transfers enqueue asynchronously and ALL
            # per-chunk device compute (tracking, and — when the providers
            # are the native device implementations — DINO and depth too)
            # overlaps them: each chunk's programs wait only on that chunk's
            # transfer, so total wall-clock approaches
            # max(transfer, compute). The video is uploaded exactly once;
            # later stages consume the device-side concatenation.
            from tdspa.features.depth import VideoDepthEstimator
            from tdspa.features.dino import DinoFeatureExtractor

            stream_dino = self.use_dino and isinstance(
                self.dino_extractor, DinoFeatureExtractor
            )
            # Per-chunk depth equals the full-video result only when chunk
            # boundaries align with the estimator's temporal-attention
            # groups.
            stream_depth = (
                self.use_depth
                and isinstance(self.depth_provider, VideoDepthEstimator)
                and chunk % self.depth_provider.frame_chunk == 0
            )
            t0 = time.perf_counter()
            if self.upload_yuv420 and h % 2 == 0 and w % 2 == 0:
                # Halve the wire bytes: source footage is 4:2:0 anyway, luma
                # (what tracking consumes) stays lossless, RGB reconstructs
                # on device (see tdspa/ops/yuv.py).
                from tdspa.ops.yuv import rgb_to_yuv420, yuv420_to_rgb

                chunks = []
                for i in range(0, t, chunk):
                    y, u, v = rgb_to_yuv420(video[i : i + chunk])
                    chunks.append(
                        yuv420_to_rgb(
                            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
                        )
                    )
            else:
                chunks = [
                    jnp.asarray(video[i : i + chunk]) for i in range(0, t, chunk)
                ]
            track_data = self.track_provider.track_chunks(chunks)
            dino_parts = (
                [self.dino_extractor(c) for c in chunks] if stream_dino else None
            )
            depth_parts = (
                [self.depth_provider(c) for c in chunks] if stream_depth else None
            )
            # The full concatenated video is only needed by non-streaming
            # feature consumers; skip the 100+ MB device copy otherwise.
            need_full = (self.use_dino and not stream_dino) or (
                self.use_depth and not stream_depth
            )
            video_dev = jnp.concatenate(chunks, axis=0) if need_full else None
            # Sync: one host value per result chain forces completion of
            # upload + tracking + streamed features. Fetch from the
            # CONCATENATED feature arrays — a concat completes only when all
            # its inputs have, so every chunk's compute is accounted to this
            # stage rather than leaking into the fused tail's timing
            # (round-2's mysterious "1.5 s tail" was exactly this leak).
            float(jnp.sum(track_data["tracks"]))
            if dino_parts is not None:
                dino_grid = jnp.concatenate(dino_parts, axis=0)
                float(jnp.sum(dino_grid.astype(jnp.float32)))
            if depth_parts is not None:
                depth_maps = jnp.concatenate(depth_parts, axis=0)
                float(jnp.sum(depth_maps.astype(jnp.float32)))
            self.timings["upload_tracking_features"] = time.perf_counter() - t0
            logging.info(
                "upload+tracking%s%s (streamed, overlapped): %.3fs",
                "+dino" if stream_dino else "",
                "+depth" if stream_depth else "",
                self.timings["upload_tracking_features"],
            )
        else:
            # One host->HBM upload of the video, shared by every device
            # stage; accelerator-resident trackers (Pallas LK) consume it
            # too, host trackers work from the numpy copy.
            video_dev = self._timed("video_upload", jnp.asarray, video)
            tracker_input = video_dev if on_device_tracker else video
            track_data = self._timed(
                "tracking", self.track_provider, tracker_input
            )
        tracks_2d = jnp.asarray(track_data["tracks"])
        visible = jnp.asarray(track_data["visible"])

        if self.use_dino and dino_grid is None:
            dino_grid = jnp.asarray(
                self._timed("dino_features", self.dino_extractor, video_dev)
            )
        if self.use_depth and depth_maps is None:
            depth_maps = jnp.asarray(
                self._timed("depth", self.depth_provider, video_dev)
            )

        num_tracks = int(tracks_2d.shape[0])
        num_support = min(self.num_support_tracks, max(num_tracks - 1, 1))
        num_queries = min(
            self.num_query_points, max(num_tracks - num_support, 1)
        )

        # Params need an example batch for structure checking: build the
        # batch shapes cheaply from the fused tail's own split on zeros.
        if self.params is None:
            key = jax.random.PRNGKey(self.seed)
            example_batch = split_and_sample_queries(
                key,
                jnp.zeros((num_tracks, t, 3)),
                visible,
                num_support,
                num_queries,
                t,
                dino_features=jnp.zeros((num_tracks, t, 768))
                if self.use_dino
                else None,
                depth_features=jnp.zeros((num_tracks, t, 256))
                if self.use_depth
                else None,
            )
            self.load_params(example_batch)

        t0 = time.perf_counter()
        if self.mesh is not None:
            if self._mesh_tail is None:
                self._mesh_tail = make_mesh_tail(
                    self.mesh,
                    self.model,
                    num_support,
                    num_queries,
                    (h, w),
                    self.use_dino,
                    self.use_depth,
                )
            predictions, batch, tracks_3d = self._mesh_tail(
                self.params,
                tracks_2d,
                visible,
                dino_grid,
                depth_maps,
                jax.random.PRNGKey(self.seed),
            )
        elif self.tail_artifact:
            if self._artifact_tail is None:
                from tdspa.infer.export import load_exported

                self._artifact_tail = load_exported(self.tail_artifact)
            features = []
            if self.use_dino:
                features.append(dino_grid)
            if self.use_depth:
                features.append(depth_maps)
            out = self._artifact_tail.call(
                self.params, jnp.uint32(self.seed), tracks_2d, visible,
                *features,
            )
            from tdspa.models.containers import TrackAutoEncoderResults

            predictions = TrackAutoEncoderResults(
                tracks=out["tracks"],
                visible_logits=out["visible_logits"],
                certain_logits=out["certain_logits"],
            )
            batch = {
                "support_tracks": out["support_tracks"],
                "query_tracks": out["query_tracks"],
            }
            tracks_3d = out["tracks_3d"]
        else:
            predictions, batch, tracks_3d = fused_tail(
                self.params,
                tracks_2d,
                visible,
                dino_grid,
                depth_maps,
                jax.random.PRNGKey(self.seed),
                self.model,
                num_support,
                num_queries,
                (h, w),
                self.use_dino,
                self.use_depth,
            )
        # Host value fetch (block_until_ready returns at enqueue on
        # remote-tunnel platforms, under-reporting this stage).
        float(jnp.sum(predictions.tracks))
        self.timings["fused_tail"] = time.perf_counter() - t0
        logging.info("fused_tail (lift+sample+split+model): %.3fs",
                     self.timings["fused_tail"])

        return {
            "predictions": predictions,
            "video": video,
            # Device-resident: downloading [N T 3] track sets through a
            # dev-tunnel transport costs seconds; ``save_results`` (or any
            # host consumer) converts with np.asarray on demand.
            "tracks_3d": tracks_3d,
            "support_tracks": batch["support_tracks"][0],
            "query_tracks": batch["query_tracks"][0],
            # Left device-resident (can be ~100s of MB); np.asarray() if
            # host access is needed.
            "depth": depth_maps,
            "fps": fps,
            "timings": dict(self.timings),
        }

    def run(self, video_path: str) -> dict:
        video, fps = load_video(video_path, max_frames=self.num_output_frames)
        logging.info(
            "Loaded video: %d frames, %dx%d, %.2f fps",
            video.shape[0], video.shape[1], video.shape[2], fps,
        )
        return self.run_on_frames(video, fps)


def run_inference(video_path: str, checkpoint_path: str, **kwargs) -> dict:
    """Reference-compatible entry (inference.py:511)."""
    pipeline = InferencePipeline(checkpoint_path=checkpoint_path, **kwargs)
    return pipeline.run(video_path)


def save_results(results: dict, output_dir: str) -> None:
    """predictions.npz + video_info.txt (reference inference.py:638-660)."""
    os.makedirs(output_dir, exist_ok=True)
    pred_tracks = np.asarray(results["predictions"].tracks[0])
    pred_visible = np.asarray(results["predictions"].visible_logits[0])
    np.savez(
        os.path.join(output_dir, "predictions.npz"),
        tracks_3d=pred_tracks,
        visible_logits=pred_visible,
        query_tracks=np.asarray(results["query_tracks"]),
        support_tracks=np.asarray(results["support_tracks"]),
    )
    with open(os.path.join(output_dir, "video_info.txt"), "w") as f:
        f.write(f"FPS: {results['fps']}\n")
        f.write(f"Frames: {pred_tracks.shape[1]}\n")
        f.write(f"Query points: {pred_tracks.shape[0]}\n")
    logging.info("Results saved to %s", output_dir)
