"""Learning-rate schedule: linear warmup -> cosine decay to zero.

Reference train.py:41-57.
"""

from __future__ import annotations

import optax


def create_learning_rate_schedule(
    base_lr: float, warmup_steps: int, total_steps: int
):
    warmup = optax.linear_schedule(
        init_value=0.0, end_value=base_lr, transition_steps=warmup_steps
    )
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(total_steps - warmup_steps, 1),
        alpha=0.0,
    )
    return optax.join_schedules(
        schedules=[warmup, cosine], boundaries=[warmup_steps]
    )
