#!/bin/bash
# One-command real-weight smoke (run the day the released weights are
# reachable — this dev environment has zero egress, so everything below
# resolves from LOCAL files / a pre-seeded HF cache only).
#
# Inputs:
#   $1  path to the released 3DSPA checkpoint (3dspa_ckpt.npz — the
#       reference's layout loads unchanged through tdspa.infer.checkpoint,
#       incl. its square projection kernels via projection_policy;
#       tests/integration/test_reference_checkpoint_drill.py drills the
#       exact layout against random-init weights).
#   $2  a test video (mp4 or npy [T H W 3] uint8)
#
# Pre-seeded caches (optional but recommended):
#   export HF_HUB_CACHE=/path/to/seeded/hub      # facebook/dinov2-base
#   VDA weights: pass --depth_checkpoint=<video_depth_anything_vitb.pth>
#
# Expected: predictions.npz (tracks [Q T 3], visible logits) + a sane
# realism score printed; compare against the reference implementation's
# output on the same video to close VERDICT "real-weight validation".
set -eu
CKPT=${1:?usage: real_weight_smoke.sh 3dspa_ckpt.npz video.mp4 [outdir]}
VIDEO=${2:?usage: real_weight_smoke.sh 3dspa_ckpt.npz video.mp4 [outdir]}
OUT=${3:-/tmp/real_weight_smoke}

export HF_HUB_OFFLINE=${HF_HUB_OFFLINE:-1}
cd "$(dirname "$0")/.."

python -m tdspa.cli.infer \
  --video_path="$VIDEO" \
  --checkpoint_path="$CKPT" \
  --output_dir="$OUT"

python - "$OUT" <<'EOF'
import sys

import numpy as np

out = np.load(f"{sys.argv[1]}/predictions.npz")
tracks, vis = out["tracks_3d"], out["visible_logits"]
assert np.isfinite(tracks).all(), "non-finite tracks"
print("tracks_3d", tracks.shape, "range", tracks.min(), tracks.max())
print("visible fraction", (vis > 0).mean())
print("SMOKE OK")
EOF
