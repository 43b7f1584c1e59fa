"""Inference CLI — reference-compatible flag surface (inference.py:53-64).

Example:
  python -m tdspa.cli.infer --video_path=clip.mp4 \
      --checkpoint_path=3dspa_ckpt.npz --output_dir=./out

Extra flags beyond the reference: --track_provider
(cotracker|lk|static|npz:<path>), --precomputed_tracks, --seed,
--quantize, --bf16_residual (TPU serving knobs; off by default = the
reference's f32-residual numerics).
"""

from absl import app, flags, logging
import jax.numpy as jnp

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_path", None, "Path to 3DSPA model checkpoint")
flags.DEFINE_string("video_path", None, "Path to input video file")
flags.DEFINE_string("output_dir", "./inference_output", "Output directory")
flags.DEFINE_integer("num_output_frames", 150, "Number of output frames")
flags.DEFINE_bool("use_dino", True, "Use DINOv2 features")
flags.DEFINE_bool("use_depth", True, "Use depth features")
flags.DEFINE_bool(
    "quantize", False,
    "int8 dynamic quantization of the model's projection/MLP matmuls "
    "(2x MXU rate on TPU v5e; same checkpoint layout)",
)
flags.DEFINE_bool(
    "bf16_residual", False,
    "bf16 residual-stream activations in the model's transformer stacks "
    "(halves decoder elementwise/HBM traffic; ~0.6% relative output error "
    "vs the reference's f32 residual — see docs/BENCHMARKS.md)",
)
flags.DEFINE_bool(
    "fused_block", False,
    "Whole-block Pallas kernel for the unmasked self-attention stacks. "
    "Measured 3.3x SLOWER than the default XLA path at decode shapes — "
    "recorded-negative toggle (docs/BENCHMARKS.md 'Fused "
    "transformer-block kernel')",
)
flags.DEFINE_float(
    "tracking_input_scale", 1.0,
    "LK tracker luma resolution factor (1.0 or 0.5). 0.5 drops the finest "
    "pyramid level's share of the tracking kernel; measured time/quality "
    "curve in docs/BENCHMARKS.md 'Tracking input-scale knob'",
)
flags.DEFINE_float(
    "depth_output_scale", 1.0,
    "Run the DPT head's full-resolution tail at this scale and bilinearly "
    "upsample the depth map (serving knob; approximate — the head's final "
    "convs are nonlinear. 0.5 measured -21% depth-stage time; 1.0 = exact "
    "reference head)",
)
flags.DEFINE_integer(
    "depth_input_size", 518,
    "Resize frames so the long side ~ this before the VDA depth backbone "
    "(serving knob; approximate — the backbone dominates the depth stage "
    "and scales ~quadratically with side length. 518 = exact reference "
    "input)",
)
flags.DEFINE_bool(
    "fast_gelu", False,
    "tanh-approximate GELU in the DINOv2/VDA ViT backbones (serving knob; "
    "-17.5% measured on the DINO stage, ~1e-3 relative activation delta "
    "vs the exact-erf reference GELU)",
)
flags.DEFINE_integer("num_query_points", 512, "Number of query points")
flags.DEFINE_integer("num_support_tracks", 2048, "Number of support tracks")
flags.DEFINE_integer("tracking_grid_size", 64, "Grid size for dense tracking")
flags.DEFINE_string("dino_model", "facebook/dinov2-base", "DINOv2 model name")
flags.DEFINE_string("vda_model_path", None, "VideoDepthAnything checkpoint (.pth)")
flags.DEFINE_enum(
    "projection_policy", "error", ["error", "slice", "ignore"],
    "Handling of reference-layout square dino/depth projection kernels in "
    "the checkpoint (see tdspa.infer.checkpoint.adapt_reference_projections)",
)
flags.DEFINE_bool(
    "vda_torch_adapter", False,
    "Run VDA through the external torch repo instead of the native "
    "Flax converter (needs the Video-Depth-Anything clone on sys.path)",
)
flags.DEFINE_string(
    "vda_encoder", "vitb", "VideoDepthAnything encoder: vits, vitb, or vitl"
)
# tdspa extras
flags.DEFINE_string(
    "track_provider", "auto",
    "auto | cotracker | lk | static | npz:<path-to-tracks.npz>",
)
flags.DEFINE_integer("seed", 0, "Support/query split RNG seed")
flags.DEFINE_integer(
    "tracker_corr_radius", 0,
    "LK tracker: cost-volume re-localization radius (0 disables; drift "
    "recovery for long/fast-motion content)",
)
flags.DEFINE_integer(
    "tracker_corr_rescue_level", 0,
    "LK tracker: also search the cost volume at this pyramid level "
    "(covers radius * 2^level px — fast-motion re-acquisition; 0 disables)",
)
flags.DEFINE_string(
    "tracker_matcher", "",
    "LK tracker: learned matching head ('' disables, 'auto' = engage the "
    "shipped matcher only when the video is photometrically degraded "
    "(noise/low contrast/flicker — per-video estimate), 'default' = always "
    "use the shipped pretrained matcher, else a matcher .npz path). See "
    "tdspa/features/matcher.py",
)

flags.DEFINE_bool(
    "debug_nans", False,
    "Enable jax_debug_nans: any op producing a NaN raises with a traceback "
    "(re-runs the offending computation op-by-op; debug only)",
)
flags.DEFINE_string(
    "tail_artifact", None,
    "Pre-exported AOT artifact of the fused tail (tdspa-export): dispatch "
    "the deserialized program instead of tracing the tail at startup. "
    "Traced shapes must match this run's operating point "
    "(docs/SERVING.md 'AOT export')",
)
flags.DEFINE_string(
    "profile_dir", None,
    "Write a jax.profiler (Perfetto/XProf-compatible) trace of the "
    "pipeline run to this directory (SURVEY §5 tracing row)",
)


def _build_track_provider():
    from tdspa.features import tracks as T

    choice = FLAGS.track_provider
    if choice.startswith("npz:"):
        return T.PrecomputedTrackProvider(choice[4:])
    if choice == "cotracker":
        return T.CoTrackerProvider(grid_size=FLAGS.tracking_grid_size)
    if choice == "lk":
        return T.PyramidalLKTracker(
            grid_size=FLAGS.tracking_grid_size,
            corr_radius=FLAGS.tracker_corr_radius,
            corr_rescue_level=FLAGS.tracker_corr_rescue_level,
            matcher=FLAGS.tracker_matcher or None,
            input_scale=FLAGS.tracking_input_scale,
        )
    if choice == "static":
        return T.StaticGridProvider(grid_size=FLAGS.tracking_grid_size)
    return None  # auto: cotracker if importable else LK


def main(argv):
    del argv
    if FLAGS.video_path is None:
        raise ValueError("Must provide video_path")
    if FLAGS.checkpoint_path is None:
        raise ValueError("Must provide checkpoint_path")

    from tdspa.infer.pipeline import InferencePipeline, save_results
    from tdspa.parallel.mesh import maybe_initialize_distributed

    from tdspa.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()  # warm starts (ROADMAP r2 #9)
    if FLAGS.debug_nans:
        from tdspa.utils.debug import enable_debug_nans

        enable_debug_nans()  # SURVEY §5 sanitizers row
    maybe_initialize_distributed()  # multi-host (DCN) when launched as such

    depth_provider = None
    if FLAGS.vda_model_path:
        if FLAGS.vda_torch_adapter:
            from tdspa.features.depth import TorchVDAProvider

            depth_provider = TorchVDAProvider(
                encoder=FLAGS.vda_encoder, model_path=FLAGS.vda_model_path
            )
        else:
            # Native path: convert the .pth into the Flax DPT estimator
            # (including temporal motion modules) and run depth on TPU.
            from tdspa.features.depth import VideoDepthEstimator

            depth_provider = VideoDepthEstimator.from_checkpoint(
                FLAGS.vda_model_path, encoder=FLAGS.vda_encoder,
                output_scale=FLAGS.depth_output_scale,
                input_size=FLAGS.depth_input_size,
                gelu_approximate=FLAGS.fast_gelu,
            )

    pipeline = InferencePipeline(
        checkpoint_path=FLAGS.checkpoint_path,
        num_output_frames=FLAGS.num_output_frames,
        use_dino=FLAGS.use_dino,
        use_depth=FLAGS.use_depth,
        num_query_points=FLAGS.num_query_points,
        num_support_tracks=FLAGS.num_support_tracks,
        tracking_grid_size=FLAGS.tracking_grid_size,
        dino_model=FLAGS.dino_model,
        vda_encoder=FLAGS.vda_encoder,
        track_provider=_build_track_provider(),
        depth_provider=depth_provider,
        seed=FLAGS.seed,
        projection_policy=FLAGS.projection_policy,
        quantize=FLAGS.quantize,
        residual_dtype=jnp.bfloat16 if FLAGS.bf16_residual else None,
        depth_output_scale=FLAGS.depth_output_scale,
        depth_input_size=FLAGS.depth_input_size,
        gelu_approximate=FLAGS.fast_gelu,
        tracking_input_scale=FLAGS.tracking_input_scale,
        fused_block=FLAGS.fused_block,
        tail_artifact=FLAGS.tail_artifact,
    )
    if FLAGS.profile_dir:
        from tdspa.utils.profiling import profile_trace

        with profile_trace(FLAGS.profile_dir):
            results = pipeline.run(FLAGS.video_path)
    else:
        results = pipeline.run(FLAGS.video_path)
    save_results(results, FLAGS.output_dir)
    logging.info("Inference completed!")


def cli():
    app.run(main)


if __name__ == "__main__":
    cli()
