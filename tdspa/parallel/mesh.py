"""Device mesh construction — the single communication abstraction.

The reference has no distributed backend of any kind (no NCCL/MPI, no
collectives — SURVEY §2.8); scaling here is expressed entirely through
``jax.sharding``: a named mesh over the TPU slice, ``NamedSharding``
annotations on ``jit`` boundaries, and XLA-inserted collectives that ride ICI
within a slice (DCN across hosts via ``jax.distributed.initialize``).

Axis conventions:

* ``data``  — batch-parallel (DP). Gradients all-reduce over ICI.
* ``seq``   — set-parallel over this model's long axes: the N support tracks
  in the encoder (cross-attention KV sharding; XLA all-gathers or
  psum-reduces the 128-latent queries' attention over the track set) and the
  Q query points in the decoder (embarrassingly parallel after encode).

TP/PP/EP are intentionally not axes here: at ~94M params the model fits one
chip's HBM many times over, T is a fixed model constant (150), and the
compute-heavy axes ARE batch, tracks, and queries. ``seq`` is this model's
counterpart of sequence/context parallelism.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None,
    seq: int = 1,
    devices=None,
    axis_names: tuple[str, str] = ("data", "seq"),
) -> Mesh:
    """Build a 2D ('data', 'seq') mesh over the available devices.

    Args:
      data: size of the data axis; defaults to n_devices // seq.
      seq: size of the set-parallel axis.
      devices: explicit device list (defaults to ``jax.devices()``).
      axis_names: mesh axis names.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        if n % seq:
            raise ValueError(f"{n} devices not divisible by seq={seq}")
        data = n // seq
    if data * seq > n:
        raise ValueError(f"mesh {data}x{seq} needs {data * seq} devices, have {n}")
    grid = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(grid, axis_names)


def default_mesh(seq: int = 1) -> Mesh:
    """All available devices, data-parallel-major."""
    return make_mesh(seq=seq)


def maybe_initialize_distributed() -> None:
    """Multi-host init (DCN) when launched under a multi-process runtime.

    No-op on a single host; safe to call unconditionally from CLIs.
    """
    import os

    if any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ):
        jax.distributed.initialize()
