"""Sharding specs for model batches and train state.

Layout policy (see mesh.py for axis semantics):

* training batches: every array sharded on its leading batch dim over
  ``data``; support tracks and queries additionally sharded over ``seq``
  (their set axes are attention KV / embarrassingly-parallel axes).
* params/opt_state: replicated (94M params — replication is cheaper than TP
  collectives at this scale; gradient all-reduce rides ICI).
* decode-time query sharding: queries split over every mesh axis at once
  ("flatten" the mesh) for single-video inference, where batch == 1 and all
  parallelism must come from the query set.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-dim batch sharding."""
    return NamedSharding(mesh, P(data_axis))


def train_batch_spec(seq_shard: bool = True) -> dict:
    """PartitionSpecs per batch key for the training step.

    The track/query set axis rides ``seq`` when seq_shard is set; visibility
    and query metadata follow their arrays.
    """
    set_axis = "seq" if seq_shard else None
    return {
        "support_tracks": P("data", set_axis),
        "support_tracks_visible": P("data", set_axis),
        "query_points": P("data", set_axis),
        "query_tracks": P("data", set_axis),
        "query_tracks_visible": P("data", set_axis),
        "boundary_frame": P("data"),
        "dino_features": P("data", set_axis),
        "depth_features": P("data", set_axis),
    }


def query_sharded_batch_spec() -> dict:
    """Single-video inference: all parallelism from the track/query sets.

    Batch is 1; support tracks shard over ('data','seq') jointly for the
    encoder's cross-attention KV set, and query points shard the same way so
    each device decodes its own slice of queries against replicated latents.
    """
    both = ("data", "seq")
    return {
        "support_tracks": P(None, both),
        "support_tracks_visible": P(None, both),
        "query_points": P(None, both),
        "query_tracks": P(None, both),
        "query_tracks_visible": P(None, both),
        "boundary_frame": P(None),
        "dino_features": P(None, both),
        "depth_features": P(None, both),
    }


def shard_batch(mesh: Mesh, batch: dict, specs: dict | None = None) -> dict:
    """Device-put a batch under the given (or training) specs."""
    specs = train_batch_spec() if specs is None else specs
    out = {}
    for key, value in batch.items():
        spec = specs.get(key, P())
        out[key] = jax.device_put(value, NamedSharding(mesh, spec))
    return out
