"""Training CLI — reference-compatible flag surface (train.py:24-38).

Example:
  python -m tdspa.cli.train --model_type=3dspa --dataset_path=/data/kubric3d \
      --batch_size=64 --num_epochs=300

``--config_path`` is accepted and, as in the reference (train.py:308), used
as the dataset path when ``--dataset_path`` is not given. Extra flags beyond
the reference: --dataset_path, --max_steps, --tiny_model, --use_wandb,
--log_jsonl, --seq_shards.
"""

import os

from absl import app, flags, logging
import jax

from tdspa.data.providers import load_kubric3d_dataset, load_tapvid_dataset
from tdspa.train.loop import train
from tdspa.train.metrics import MetricLogger

FLAGS = flags.FLAGS

flags.DEFINE_string("model_type", "trajan", "Model type: trajan or 3dspa")
flags.DEFINE_string("config_path", None, "Path to config file")
flags.DEFINE_string("checkpoint_dir", "./checkpoints", "Checkpoint directory")
flags.DEFINE_string("wandb_project", "3dspa", "WandB project name")
flags.DEFINE_string("wandb_entity", None, "WandB entity name")
flags.DEFINE_string("wandb_run_name", None, "WandB run name")
flags.DEFINE_integer("num_epochs", 300, "Number of training epochs")
flags.DEFINE_integer("batch_size", 64, "Batch size")
flags.DEFINE_integer("eval_freq", 1000, "Evaluation frequency in steps")
flags.DEFINE_integer("save_freq", 5000, "Checkpoint save frequency in steps")
flags.DEFINE_float("learning_rate", 1e-4, "Learning rate")
flags.DEFINE_integer("warmup_steps", 10000, "Warmup steps")
flags.DEFINE_integer("num_output_frames", 150, "Number of output frames")
flags.DEFINE_bool("use_dino", True, "Use DINO features (for 3DSPA)")
flags.DEFINE_bool("use_depth", True, "Use depth features (for 3DSPA)")
# tdspa extras
flags.DEFINE_string("dataset_path", None, "Dataset directory (.npz per video)")
flags.DEFINE_integer("max_steps", None, "Stop after this many steps")
flags.DEFINE_bool("tiny_model", False, "Use a tiny model config (smoke tests)")
flags.DEFINE_bool(
    "bf16", False,
    "bfloat16 matmul compute in the model (params, optimizer state, "
    "softmax, losses and the residual stream stay float32 — the standard "
    "TPU mixed-precision training recipe; same checkpoint layout)",
)
flags.DEFINE_bool("use_wandb", True, "Log to WandB when available")
flags.DEFINE_bool(
    "debug_nans", False,
    "Enable jax_debug_nans: any op producing a NaN raises with a traceback "
    "(re-runs the offending computation op-by-op; debug only)",
)
flags.DEFINE_string(
    "profile_dir", None,
    "Write a jax.profiler (Perfetto/XProf-compatible) trace of the "
    "training run to this directory (SURVEY §5 tracing row)",
)
flags.DEFINE_string("log_jsonl", None, "Also append metrics to this JSONL file")
flags.DEFINE_integer("num_support_tracks", 2048, "Support tracks per example")
flags.DEFINE_integer("num_query_tracks", 2048, "Query tracks per example")
flags.DEFINE_integer("log_freq", 10, "Metric logging frequency in steps")
flags.DEFINE_integer(
    "decoder_scan_chunk_size", None,
    "Chunk the decoder's query axis via nn.scan (memory knob for large "
    "batch x query products; reference track_autoencoder.py:350-382)",
)
flags.DEFINE_integer(
    "encoder_scan_chunk_size", None,
    "Chunk the encoder's support-track axis via nn.scan + remat (memory "
    "knob: bounds the [B,N,T,qkv] encoder activations that dominate the "
    "full 2048-track operating point)",
)
flags.DEFINE_integer(
    "grad_accum_steps", 1,
    "Split each batch into this many microbatches and accumulate gradients "
    "(one optimizer update per batch; memory knob for the full batch-64 x "
    "2048-track operating point on one chip)",
)


def main(argv):
    del argv
    from tdspa.parallel.mesh import maybe_initialize_distributed

    from tdspa.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()  # warm starts (ROADMAP r2 #9)
    if FLAGS.debug_nans:
        from tdspa.utils.debug import enable_debug_nans

        enable_debug_nans()  # SURVEY §5 sanitizers row
    maybe_initialize_distributed()  # multi-host (DCN) when launched as such
    # No explicit dataset: use ./data if present, else synthetic tracks
    # (an explicit non-directory path means a tfds builder name and errors
    # if tfds is missing — never silently train on synthetic data).
    dataset_path = FLAGS.dataset_path or FLAGS.config_path or (
        "./data" if os.path.isdir("./data") else ""
    )

    loader_kwargs = dict(
        batch_size=FLAGS.batch_size,
        num_support_tracks=FLAGS.num_support_tracks,
        num_query_tracks=FLAGS.num_query_tracks,
        num_frames=FLAGS.num_output_frames,
    )
    if FLAGS.model_type == "3dspa":
        train_ds = load_kubric3d_dataset(
            dataset_path, split="train", shuffle=True,
            use_dino=FLAGS.use_dino, use_depth=FLAGS.use_depth, **loader_kwargs,
        )
        eval_ds = load_kubric3d_dataset(
            dataset_path, split="validation", shuffle=False,
            use_dino=FLAGS.use_dino, use_depth=FLAGS.use_depth, **loader_kwargs,
        )
    else:
        train_ds = load_tapvid_dataset(
            dataset_path, split="train", shuffle=True, **loader_kwargs
        )
        eval_ds = load_tapvid_dataset(
            dataset_path, split="validation", shuffle=False, **loader_kwargs
        )

    logger = MetricLogger(
        project=FLAGS.wandb_project,
        entity=FLAGS.wandb_entity,
        run_name=FLAGS.wandb_run_name
        or f"{FLAGS.model_type}_{FLAGS.wandb_project}",
        config={
            "model_type": FLAGS.model_type,
            "batch_size": FLAGS.batch_size,
            "learning_rate": FLAGS.learning_rate,
            "num_epochs": FLAGS.num_epochs,
            "num_output_frames": FLAGS.num_output_frames,
            "use_dino": FLAGS.use_dino,
            "use_depth": FLAGS.use_depth,
        },
        use_wandb=FLAGS.use_wandb,
        jsonl_path=FLAGS.log_jsonl,
    )

    overrides = {}
    if FLAGS.tiny_model:
        from tdspa.utils.testing import TINY_3D

        overrides = dict(TINY_3D)
    if FLAGS.decoder_scan_chunk_size:
        overrides["decoder_scan_chunk_size"] = FLAGS.decoder_scan_chunk_size
    if FLAGS.encoder_scan_chunk_size:
        overrides["encoder_scan_chunk_size"] = FLAGS.encoder_scan_chunk_size
    if FLAGS.bf16:
        import jax.numpy as jnp

        overrides["dtype"] = jnp.bfloat16

    logging.info("devices: %s", jax.devices())
    import contextlib

    trace_ctx = contextlib.nullcontext()
    if FLAGS.profile_dir:
        from tdspa.utils.profiling import profile_trace

        trace_ctx = profile_trace(FLAGS.profile_dir)
    with trace_ctx:
        train(
            train_ds,
            eval_ds=eval_ds,
            model_type=FLAGS.model_type,
            num_epochs=FLAGS.num_epochs,
            learning_rate=FLAGS.learning_rate,
            warmup_steps=FLAGS.warmup_steps,
            num_output_frames=FLAGS.num_output_frames,
            use_dino=FLAGS.use_dino,
            use_depth=FLAGS.use_depth,
            eval_freq=FLAGS.eval_freq,
            save_freq=FLAGS.save_freq,
            log_freq=FLAGS.log_freq,
            checkpoint_dir=FLAGS.checkpoint_dir,
            logger=logger,
            max_steps=FLAGS.max_steps,
            grad_accum_steps=FLAGS.grad_accum_steps,
            **overrides,
        )
    logging.info("Training completed")


def cli():
    app.run(main)


if __name__ == "__main__":
    cli()
