"""TAPVid-3D evaluation CLI (reference evaluate_tapvid3d.py:25-36, 288-444).

Example:
  python -m tdspa.cli.evaluate --checkpoint_path=3dspa_ckpt.npz \
      --dataset_path=/data/tapvid3d --data_sources=drivetrack,adt,pstudio

Writes ``<output_dir>/results.json`` with the reference's schema:
``{"per_source": {source: {scaling: metrics}}, "overall": {scaling: ...}}``.

Split files come from ``tapnet.tapvid3d.splits`` when importable; otherwise
every ``.npz`` under ``<dataset_path>/<source>/`` is evaluated.
"""

import json
import os

from absl import app, flags, logging
import numpy as np

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_path", None, "Path to model checkpoint")
flags.DEFINE_string("dataset_path", None, "Path to TAPVid-3D dataset")
flags.DEFINE_string("output_dir", "./eval_results", "Output directory")
flags.DEFINE_integer("batch_size", 8, "Batch size for evaluation")
flags.DEFINE_integer("num_output_frames", 150, "Number of output frames")
flags.DEFINE_bool("use_dino", True, "Use DINO features")
flags.DEFINE_bool("use_depth", True, "Use depth features")
flags.DEFINE_list(
    "depth_scalings", ["median"],
    "Depth scaling strategies: median, per_trajectory, none "
    "(reference default: median — evaluate_tapvid3d.py:32-33)",
)
flags.DEFINE_list(
    "data_sources", ["drivetrack", "adt", "pstudio"], "Data sources to evaluate"
)
flags.DEFINE_bool("use_minival", True, "Use minival split (otherwise full_eval)")
flags.DEFINE_integer("track_bucket", 256, "Pad track counts to this multiple")
flags.DEFINE_enum(
    "projection_policy", "error", ["error", "slice", "ignore"],
    "Handling of reference-layout square dino/depth projection kernels in "
    "the checkpoint (see tdspa.infer.checkpoint.adapt_reference_projections)",
)

flags.DEFINE_bool(
    "debug_nans", False,
    "Enable jax_debug_nans: any op producing a NaN raises with a traceback "
    "(re-runs the offending computation op-by-op; debug only)",
)
flags.DEFINE_bool(
    "tiny_model", False,
    "Use the tiny 3DSPA config (smoke tests / CI; checkpoint must match)",
)


def _split_files(source: str) -> list | None:
    try:
        from tapnet.tapvid3d.splits import tapvid3d_splits

        if FLAGS.use_minival:
            return tapvid3d_splits.get_minival_files(subset=source)
        return tapvid3d_splits.get_full_eval_files(subset=source)
    except ImportError:
        return None


def main(argv):
    del argv
    if FLAGS.checkpoint_path is None:
        raise ValueError("Must provide checkpoint_path")
    if FLAGS.dataset_path is None:
        raise ValueError("Must provide dataset_path")
    os.makedirs(FLAGS.output_dir, exist_ok=True)

    from tdspa.data.providers import NpzDirectoryProvider
    from tdspa.eval.harness import evaluate_model
    from tdspa.infer.checkpoint import load_checkpoint
    from tdspa.parallel.mesh import maybe_initialize_distributed

    from tdspa.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()  # warm starts (ROADMAP r2 #9)
    if FLAGS.debug_nans:
        from tdspa.utils.debug import enable_debug_nans

        enable_debug_nans()  # SURVEY §5 sanitizers row
    maybe_initialize_distributed()  # multi-host (DCN) when launched as such

    logging.info("Loading checkpoint from %s", FLAGS.checkpoint_path)
    params = load_checkpoint(
        FLAGS.checkpoint_path, projection_policy=FLAGS.projection_policy
    )

    model = None  # evaluate_model builds the full-size 3DSPA by default
    if FLAGS.tiny_model:
        from tdspa.utils.testing import tiny_model_3d

        model = tiny_model_3d(
            FLAGS.num_output_frames,
            use_dino=FLAGS.use_dino,
            use_depth=FLAGS.use_depth,
        )

    all_metrics = {}
    splits_used = {}  # recorded in results.json: fallback runs evaluate a
    # DIFFERENT population (all files vs the tapnet minival/full_eval split)
    # and must be distinguishable downstream.
    for source in FLAGS.data_sources:
        logging.info("Evaluating on %s", source)
        source_dir = os.path.join(FLAGS.dataset_path, source)
        split = _split_files(source)
        provider = NpzDirectoryProvider(source_dir)
        if split is not None:
            wanted = set(split)
            indices = [
                i for i, f in enumerate(provider.files)
                if os.path.basename(f) in wanted
            ]
            splits_used[source] = (
                "minival" if FLAGS.use_minival else "full_eval"
            )
        else:
            logging.info(
                "tapnet splits unavailable; evaluating all %d files",
                len(provider.files),
            )
            indices = range(len(provider.files))
            splits_used[source] = "all_files"

        all_metrics[source] = evaluate_model(
            params,
            (provider[int(i)] for i in indices),
            num_output_frames=FLAGS.num_output_frames,
            use_dino=FLAGS.use_dino,
            use_depth=FLAGS.use_depth,
            depth_scalings=FLAGS.depth_scalings,
            track_bucket=FLAGS.track_bucket,
            batch_size=FLAGS.batch_size,
            model=model,
        )
        for scaling in FLAGS.depth_scalings:
            logging.info("  %s / %s:", source, scaling)
            for key, value in all_metrics[source][scaling].items():
                if not key.endswith("_std"):
                    logging.info("    %s: %.4f", key, value)

    overall = {}
    for scaling in FLAGS.depth_scalings:
        overall[scaling] = {}
        first = all_metrics[FLAGS.data_sources[0]][scaling]
        for key in first:
            if key.endswith("_std"):
                continue
            values = [all_metrics[s][scaling][key] for s in FLAGS.data_sources]
            overall[scaling][key] = float(np.mean(values))
            overall[scaling][f"{key}_std"] = float(np.std(values))

    results_file = os.path.join(FLAGS.output_dir, "results.json")
    with open(results_file, "w") as f:
        # "split" is an additive field over the reference schema
        # (docs/PARITY.md): "minival" | "full_eval" | "all_files" per source.
        json.dump(
            {"per_source": all_metrics, "overall": overall,
             "split": splits_used},
            f,
            indent=2,
        )
    logging.info("Results saved to %s", results_file)


def cli():
    app.run(main)


if __name__ == "__main__":
    cli()
