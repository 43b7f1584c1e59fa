"""tdspa — a TPU-native (JAX / XLA / Pallas) framework for video realism
evaluation from 3D semantic point trajectories.

This is a ground-up TPU-first rebuild of the capabilities of the reference
``TheProParadox/3dspa_code`` codebase (a CUDA/torch+single-device-JAX research
repo): the TRAJAN 2D and 3DSPA 3D Perceiver-style track autoencoders, the
training loop, the single-video inference pipeline (point tracking -> DINOv2
semantics -> video depth -> on-device 2D->3D lifting and feature sampling ->
track autoencoding), the TAPVid-3D evaluation harness, and visualization —
re-designed for TPU: static-shape batched compute for the MXU, Pallas kernels
for gather/interp hot paths, and ``jax.sharding`` meshes for multi-chip
scaling.

Package layout:
  core/      attention + embedding primitives (QK-norm parallel transformer)
  models/    TRAJAN-2D and 3DSPA-3D track autoencoders
  ops/       geometry ops: lifting, sampling, projection (XLA + Pallas)
  kernels/   Pallas TPU kernels
  data/      batch preparation and dataset providers
  features/  feature extractor front-ends (DINOv2 ViT, depth, track providers)
  train/     losses, schedules, train state/step/loop
  eval/      TAPVid-3D metrics + harness
  infer/     end-to-end inference pipeline + checkpoint I/O
  parallel/  device mesh + sharding specs (DP / query / track sharding)
  viz/       track visualization
  cli/       reference-compatible command-line entry points
"""

__version__ = "0.1.0"
