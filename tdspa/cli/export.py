"""Export the fused serving tail to an AOT StableHLO artifact.

Builds the flagship 3DSPA model at the given serving configuration, loads
the checkpoint (structure-checked the same way inference does), and writes
a ``jax.export`` artifact + JSON manifest that a serving binary can
``tdspa.infer.export.load_exported(path).call(params, seed, tracks_2d,
visible, [dino_grid], [depth_maps])`` — no model source, no re-trace. Lower
for TPU from any host with ``--platforms=tpu`` (the default exports for the
local backend). No reference counterpart (inference.py re-traces per
process); see docs/SERVING.md "AOT export".

Example:
  python -m tdspa.cli.export --checkpoint_path=3dspa_ckpt.npz \
      --output_path=./out/tail_512x512.shlo --platforms=tpu --bf16_residual
"""

from absl import app, flags, logging
import jax
import jax.numpy as jnp

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_path", None, "3DSPA checkpoint (optional: "
                    "omitting exports with random-init weights — the "
                    "artifact itself is weight-free, weights are fed at "
                    "call time)")
flags.DEFINE_string("output_path", None, "Artifact path (manifest lands at "
                    "<output_path>.json)")
flags.DEFINE_string("platforms", "", "Comma-separated lowering targets "
                    "(e.g. 'tpu' or 'tpu,cpu'); empty = local backend")
flags.DEFINE_integer("num_output_frames", 150, "Number of output frames")
flags.DEFINE_integer("video_height", 512, "Serving video height")
flags.DEFINE_integer("video_width", 512, "Serving video width")
flags.DEFINE_bool("use_dino", True, "Use DINOv2 features")
flags.DEFINE_bool("use_depth", True, "Use depth features")
flags.DEFINE_integer("num_query_points", 512, "Number of query points")
flags.DEFINE_integer("num_support_tracks", 2048, "Number of support tracks")
flags.DEFINE_integer("tracking_grid_size", 64, "Dense tracking grid (the "
                     "track-set size the tail is traced for = grid^2)")
flags.DEFINE_integer("dino_dim", 768, "DINOv2 feature dim (ViT-B: 768)")
flags.DEFINE_bool("quantize", False, "int8 dynamic-quant projection/MLP "
                  "matmuls (serving knob)")
flags.DEFINE_bool("bf16_residual", False, "bf16 residual stream (serving "
                  "knob; see docs/BENCHMARKS.md 'Residual dtype')")
flags.DEFINE_enum("projection_policy", "error", ["error", "slice", "ignore"],
                  "Reference square-projection-kernel handling (see "
                  "tdspa.infer.checkpoint.adapt_reference_projections)")
flags.DEFINE_bool("tiny_model", False,
                  "Use the tiny 3DSPA config (smoke tests / CI)")


def main(argv):
    del argv
    if FLAGS.output_path is None:
        raise ValueError("Must provide output_path")

    from tdspa.data.batch_prep import split_and_sample_queries
    from tdspa.infer.export import export_serving_tail, save_exported
    from tdspa.infer.pipeline import InferencePipeline

    t = FLAGS.num_output_frames
    num_tracks = FLAGS.tracking_grid_size ** 2
    num_support = min(FLAGS.num_support_tracks, max(num_tracks - 1, 1))
    num_queries = min(FLAGS.num_query_points, max(num_tracks - num_support, 1))

    model = None  # default: the flagship full-size 3DSPA
    if FLAGS.tiny_model:
        from tdspa.utils.testing import tiny_model_3d

        model = tiny_model_3d(
            t, use_dino=FLAGS.use_dino, use_depth=FLAGS.use_depth,
            dino_feature_dim=FLAGS.dino_dim,
        )

    # The pipeline builds the flagship model + loads/structure-checks the
    # checkpoint exactly as inference does (pipeline.py::load_params).
    pipeline = InferencePipeline(
        model=model,
        checkpoint_path=FLAGS.checkpoint_path,
        num_output_frames=t,
        use_dino=FLAGS.use_dino,
        use_depth=FLAGS.use_depth,
        num_query_points=FLAGS.num_query_points,
        num_support_tracks=FLAGS.num_support_tracks,
        tracking_grid_size=FLAGS.tracking_grid_size,
        projection_policy=FLAGS.projection_policy,
        quantize=FLAGS.quantize,
        residual_dtype=jnp.bfloat16 if FLAGS.bf16_residual else None,
    )
    example_batch = split_and_sample_queries(
        jax.random.PRNGKey(0),
        jnp.zeros((num_tracks, t, 3)),
        jnp.ones((num_tracks, t, 1)),
        num_support,
        num_queries,
        t,
        dino_features=jnp.zeros((num_tracks, t, FLAGS.dino_dim))
        if FLAGS.use_dino else None,
        depth_features=jnp.zeros((num_tracks, t, 256))
        if FLAGS.use_depth else None,
    )
    params = pipeline.load_params(example_batch)

    platforms = (
        tuple(p.strip() for p in FLAGS.platforms.split(",") if p.strip())
        or None
    )
    exported = export_serving_tail(
        pipeline.model, params,
        num_tracks=num_tracks,
        num_frames=t,
        video_hw=(FLAGS.video_height, FLAGS.video_width),
        num_support=num_support,
        num_queries=num_queries,
        use_dino=FLAGS.use_dino,
        use_depth=FLAGS.use_depth,
        dino_dim=FLAGS.dino_dim,
        platforms=platforms,
    )
    manifest = save_exported(
        exported, FLAGS.output_path,
        {
            "checkpoint_path": FLAGS.checkpoint_path,
            "num_output_frames": t,
            "video_hw": [FLAGS.video_height, FLAGS.video_width],
            "num_tracks": num_tracks,
            "num_support": num_support,
            "num_queries": num_queries,
            "use_dino": FLAGS.use_dino,
            "use_depth": FLAGS.use_depth,
            "quantize": FLAGS.quantize,
            "bf16_residual": FLAGS.bf16_residual,
        },
    )
    logging.info(
        "Exported %s (%d bytes, platforms=%s) + manifest",
        FLAGS.output_path, manifest["bytes"], manifest["platforms"],
    )


def cli():
    app.run(main)


if __name__ == "__main__":
    cli()
