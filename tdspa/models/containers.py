"""Input/output pytree containers shared by the track autoencoders.

Data contract (reference track_autoencoder.py:56-114,
track_autoencoder_3d.py:23-40): inputs are a dict of padded, static-shape
arrays; results are a ``flax.struct`` pytree so they pass through ``jit`` /
``nn.scan`` / sharding unchanged.
"""

from __future__ import annotations

from typing import Any, NotRequired, TypedDict

import flax
import jax.nn as jnn
import jax.numpy as jnp


class TrackAutoEncoderInputs(TypedDict):
    """TRAJAN 2D inputs.

    Attributes:
      support_tracks: [*B N T 2] (x, y) tracks the encoder sees.
      support_tracks_visible: [*B N T 1] per-frame visibility in {0, 1}.
      query_points: optional [*B Q 3] (t, x, y) decoder queries.
      boundary_frame: int[*B]; the first padding frame — frames at or past it
        are masked out of encoder attention.
    """

    support_tracks: Any
    support_tracks_visible: Any
    query_points: NotRequired[Any]
    boundary_frame: Any


class TrackAutoEncoder3DInputs(TypedDict):
    """3DSPA inputs.

    Attributes:
      support_tracks: [*B N T 3] (x, y, z) tracks.
      support_tracks_visible: [*B N T 1] visibility.
      query_points: optional [*B Q 4] (t, x, y, z) decoder queries.
      boundary_frame: int[*B] first padding frame.
      dino_features: optional [*B N T 768] DINOv2 features per track-frame.
      depth_features: optional [*B N T 256] depth features per track-frame.
    """

    support_tracks: Any
    support_tracks_visible: Any
    query_points: NotRequired[Any]
    boundary_frame: Any
    dino_features: NotRequired[Any]
    depth_features: NotRequired[Any]


@flax.struct.dataclass
class TrackAutoEncoderResults:
    """Decoder outputs (reference track_autoencoder.py:72-105).

    Attributes:
      tracks: [*B Q T 2|3] predicted positions.
      visible_logits: [*B Q T 1] pre-sigmoid visibility.
      certain_logits: [*B Q T 1] pre-sigmoid certainty (zeros for 3DSPA).
    """

    tracks: Any
    visible_logits: Any
    certain_logits: Any

    @property
    def visible(self):
        return (self.visible_logits > 0).astype(jnp.float32)

    @property
    def certain(self):
        return (self.certain_logits > 0).astype(jnp.float32)

    @property
    def visible_and_certain(self):
        visible = jnn.sigmoid(self.visible_logits)
        certain = jnn.sigmoid(self.certain_logits)
        return ((visible * certain) > 0.5).astype(jnp.float32)


@flax.struct.dataclass
class TrackAutoEncoderDecoderContext:
    """Decoder-side context: embedded query identities + query frames."""

    decoder_query: Any  # float['*B Q FF']
    query_frame: Any  # int['*B Q']
    boundary_frame: Any  # int['*B'] | None
