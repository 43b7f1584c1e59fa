"""Train state + optimizer construction.

Fixes the reference's non-executable optimizer wiring (train.py:164-178
calls ``.update`` on the optax *state* and reads hyperparams that were never
injected — SURVEY §2.9 Q1): the optimizer GradientTransformation lives
outside the state pytree, the jitted step calls ``optimizer.update``, and the
learning rate is recomputed from the schedule at the current step for
logging.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from tdspa.models import TrackAutoEncoder, TrackAutoEncoder3D
from tdspa.train.schedule import create_learning_rate_schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Any
    rng: Any


def build_model(
    model_type: str = "3dspa",
    num_output_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    dtype=None,
    **overrides,
):
    """Model factory keyed by the reference's ``model_type`` flag values."""
    kwargs = dict(num_output_frames=num_output_frames, **overrides)
    if dtype is not None:
        kwargs["dtype"] = dtype
    if model_type == "3dspa":
        return TrackAutoEncoder3D(use_dino=use_dino, use_depth=use_depth, **kwargs)
    if model_type == "trajan":
        return TrackAutoEncoder(**kwargs)
    raise ValueError(f"Unknown model_type: {model_type!r} (trajan | 3dspa)")


def create_optimizer(
    learning_rate: float = 1e-4,
    warmup_steps: int = 10_000,
    total_steps: int = 1_000_000,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
):
    """Global-norm clip + AdamW on a warmup-cosine schedule
    (reference train.py:236-243)."""
    schedule = create_learning_rate_schedule(
        learning_rate, warmup_steps, total_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(learning_rate=schedule, weight_decay=weight_decay),
    )
    return tx, schedule


def create_model_state(
    rng,
    dummy_batch,
    model_type: str = "3dspa",
    learning_rate: float = 1e-4,
    warmup_steps: int = 10_000,
    total_steps: int = 1_000_000,
    num_output_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    **model_overrides,
):
    """Initialize params + optimizer; returns (state, model, optimizer, schedule)."""
    model = build_model(
        model_type,
        num_output_frames=num_output_frames,
        use_dino=use_dino,
        use_depth=use_depth,
        **model_overrides,
    )
    rng, init_rng = jax.random.split(rng)
    params = jax.jit(model.init)(init_rng, dummy_batch)["params"]
    tx, schedule = create_optimizer(learning_rate, warmup_steps, total_steps)
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=0, rng=rng)
    return state, model, tx, schedule
