"""Training driver: epochs, periodic eval, real checkpointing, DP mesh.

The working counterpart of reference train.py:284-396, with the stubbed
pieces implemented: Orbax checkpoint save/resume (Q10), a runnable optax step
(Q1), device prefetch, and data parallelism over the mesh.
"""

from __future__ import annotations

import numpy as np
import jax

from tdspa.data.prefetch import device_prefetch
from tdspa.infer.checkpoint import OrbaxCheckpointer
from tdspa.parallel.shardings import shard_batch
from tdspa.train.metrics import MetricLogger
from tdspa.train.state import create_model_state
from tdspa.train.step import make_eval_step, make_train_step


def train(
    train_ds,
    eval_ds=None,
    model_type: str = "3dspa",
    num_epochs: int = 300,
    learning_rate: float = 1e-4,
    warmup_steps: int = 10_000,
    num_output_frames: int = 150,
    use_dino: bool = True,
    use_depth: bool = True,
    eval_freq: int = 1000,
    save_freq: int = 5000,
    log_freq: int = 10,
    checkpoint_dir: str | None = "./checkpoints",
    logger: MetricLogger | None = None,
    mesh=None,
    resume: bool = True,
    seed: int = 42,
    max_steps: int | None = None,
    grad_accum_steps: int = 1,
    **model_overrides,
):
    """Run the training loop; returns the final TrainState.

    ``train_ds`` / ``eval_ds`` iterate over prepared batches (see
    tdspa.data.providers.BatchedTrackDataset). Metric names and cadence match
    the reference (log every ``log_freq`` steps, eval on 10 batches every
    ``eval_freq`` steps).
    """
    logger = logger or MetricLogger(use_wandb=False)

    rng = jax.random.PRNGKey(seed)
    dummy_batch = next(iter(train_ds))
    if mesh is None:
        # Auto-size the data axis to the largest device count that divides
        # the global batch; remaining devices idle rather than erroring.
        import math

        from tdspa.parallel.mesh import make_mesh

        batch_size = int(dummy_batch["support_tracks"].shape[0])
        data = math.gcd(batch_size, jax.device_count())
        mesh = make_mesh(data=data, seq=1, devices=jax.devices()[:data])
    steps_per_epoch = max(len(train_ds), 1) if hasattr(train_ds, "__len__") else 1000
    total_steps = steps_per_epoch * num_epochs

    rng, init_rng = jax.random.split(rng)
    state, model, tx, schedule = create_model_state(
        init_rng,
        dummy_batch,
        model_type=model_type,
        learning_rate=learning_rate,
        warmup_steps=warmup_steps,
        total_steps=total_steps,
        num_output_frames=num_output_frames,
        use_dino=use_dino,
        use_depth=use_depth,
        **model_overrides,
    )

    ckptr = OrbaxCheckpointer(checkpoint_dir) if checkpoint_dir else None
    if ckptr is not None and resume and ckptr.latest_step() is not None:
        restored = ckptr.restore(template={
            "params": state.params,
            "opt_state": state.opt_state,
            "step": 0,
        })
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )

    if grad_accum_steps > 1:
        from tdspa.train.step import make_grad_accum_step

        train_step = make_grad_accum_step(
            model, tx, schedule, num_microbatches=grad_accum_steps, mesh=mesh
        )
    else:
        train_step = make_train_step(model, tx, schedule, mesh=mesh)
    eval_step = make_eval_step(model, mesh=mesh)
    if mesh is not None:
        # Pre-place the state replicated so every step hits ONE pjit cache
        # entry (the first call would otherwise key on uncommitted arrays and
        # trace twice).
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    step = int(state.step)
    for epoch in range(num_epochs):
        for batch in device_prefetch(iter(train_ds)):
            batch = shard_batch(mesh, batch)
            state, metrics = train_step(state, batch)
            step += 1

            if step % log_freq == 0:
                logger.log(
                    {k: np.asarray(v) for k, v in metrics.items()}, step=step
                )

            if eval_ds is not None and step % eval_freq == 0:
                agg: dict = {}
                for eval_batch in eval_ds.take(10):
                    eval_batch = shard_batch(mesh, eval_batch)
                    m, _ = eval_step(state.params, eval_batch)
                    for k, v in m.items():
                        agg.setdefault(k, []).append(float(v))
                logger.log({k: float(np.mean(v)) for k, v in agg.items()}, step=step)

            if ckptr is not None and step % save_freq == 0:
                ckptr.save(
                    step,
                    {
                        "params": jax.device_get(state.params),
                        "opt_state": jax.device_get(state.opt_state),
                        "step": step,
                    },
                )

            if max_steps is not None and step >= max_steps:
                logger.finish()
                return state
    logger.finish()
    return state
