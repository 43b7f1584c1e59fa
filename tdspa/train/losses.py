"""Training losses: visibility-masked L1 position + BCE occlusion.

Reference semantics (train.py:60-129): both terms are normalized by the
total visible mass (sum of the visibility mask), the L1 term summed over
coordinates and frames before that normalization. Weights: L1*5000 +
BCE*1e-8. The 2D and 3D losses are the same formula over 2- or 3-coordinate
tracks; one implementation serves both.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _compute_loss(predictions, targets, l1_weight: float, bce_weight: float):
    target_tracks = targets["query_tracks"]  # [B Q T C]
    target_visible = targets["query_tracks_visible"]  # [B Q T 1]
    pred_tracks = predictions.tracks
    pred_visible_logits = predictions.visible_logits

    visible_mask = target_visible.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(visible_mask), 1.0)

    position_error = jnp.abs(pred_tracks - target_tracks)
    position_loss = jnp.sum(position_error * visible_mask) / denom

    visible_loss = (
        jnp.sum(
            optax.sigmoid_binary_cross_entropy(pred_visible_logits, target_visible)
        )
        / denom
    )

    total_loss = l1_weight * position_loss + bce_weight * visible_loss
    return {
        "total_loss": total_loss,
        "position_loss": position_loss,
        "visible_loss": visible_loss,
    }


def compute_loss_2d(predictions, targets, l1_weight=5000.0, bce_weight=1e-8):
    """TRAJAN 2D loss (reference train.py:60-93)."""
    return _compute_loss(predictions, targets, l1_weight, bce_weight)


def compute_loss_3d(predictions, targets, l1_weight=5000.0, bce_weight=1e-8):
    """3DSPA 3D loss (reference train.py:96-129)."""
    return _compute_loss(predictions, targets, l1_weight, bce_weight)
