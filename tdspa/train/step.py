"""Jitted train/eval steps, mesh-sharded.

This is the working implementation of the reference's intended step
(train.py:132-214 cannot execute as written — SURVEY §2.9 Q1/Q2): gradients
via ``jax.value_and_grad``, a real ``optimizer.update``, and metrics returned
as device scalars (no ``float()`` on tracers).

Parallelism: with a mesh, the step is compiled with ``NamedSharding``
in/out shardings — batch over ``data`` (+ track/query sets over ``seq``),
params/opt_state replicated. XLA inserts the gradient all-reduce over ICI;
there is no hand-written communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tdspa.parallel.shardings import train_batch_spec
from tdspa.train.losses import compute_loss_2d, compute_loss_3d


def make_train_step(model, optimizer, schedule=None, mesh=None, donate: bool = True):
    """Build the jitted training step for ``model``.

    Args:
      model: a TrackAutoEncoder / TrackAutoEncoder3D instance.
      optimizer: optax GradientTransformation.
      schedule: optional lr schedule (step -> lr) for the logged rate.
      mesh: optional ``jax.sharding.Mesh``; batch shards over it.
      donate: donate the state buffers (in-place param update on device).

    Returns:
      step(state, batch) -> (new_state, metrics) with reference metric names
      ``train/{loss,position_loss,visible_loss,learning_rate}``.
    """
    loss_fn_impl = (
        compute_loss_3d
        if model.__class__.__name__ == "TrackAutoEncoder3D"
        else compute_loss_2d
    )

    def step(state, batch):
        def loss_fn(params):
            predictions = model.apply({"params": params}, batch)
            loss_dict = loss_fn_impl(predictions, batch)
            return loss_dict["total_loss"], loss_dict

        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        lr = (
            schedule(state.step)
            if schedule is not None
            else jnp.zeros((), jnp.float32)
        )
        metrics = {
            "train/loss": loss,
            "train/position_loss": loss_dict["position_loss"],
            "train/visible_loss": loss_dict["visible_loss"],
            "train/learning_rate": lr,
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    specs = train_batch_spec()
    repl = NamedSharding(mesh, P())

    # One jitted callable per batch key-set (shardings depend only on which
    # keys are present, not on shapes): construction is hoisted out of the
    # per-step path so repeated steps hit ONE pjit object whose own cache
    # guarantees no retraces (asserted in tests/dist/test_sharding.py).
    compiled_cache: dict = {}

    @functools.wraps(step)
    def sharded_step(state, batch):
        cache_key = tuple(sorted(batch))
        compiled = compiled_cache.get(cache_key)
        if compiled is None:
            compiled = jax.jit(
                step,
                in_shardings=(
                    repl,  # pytree prefix: whole state replicated
                    {k: NamedSharding(mesh, specs.get(k, P())) for k in cache_key},
                ),
                out_shardings=(repl, None),
                donate_argnums=(0,) if donate else (),
            )
            compiled_cache[cache_key] = compiled
        return compiled(state, batch)

    sharded_step.cache_size = lambda: sum(
        c._cache_size() for c in compiled_cache.values()
    )
    return sharded_step


def make_grad_accum_step(
    model,
    optimizer,
    schedule=None,
    num_microbatches: int = 8,
    mesh=None,
    donate: bool = True,
):
    """Training step with gradient accumulation over the batch axis.

    The memory lever the reference lacks entirely: the global batch is
    reshaped to ``[num_microbatches, B/num_microbatches, ...]`` and gradients
    are summed under a ``lax.scan``, so peak activation memory is ONE
    microbatch's forward+backward plus a params-sized accumulator. One
    optimizer update per global batch, numerically EQUAL to the full-batch
    step: the loss normalizes by the batch's visible mass (losses.py), so
    each microbatch's gradient is weighted by its own visible mass and the
    sum is divided by the global mass — exactly the full-batch gradient
    (the mass is data, not params, so the chain rule is a constant scale;
    asserted to 2e-6 in tests/unit/test_train.py). This is what fits the
    reference's full batch-64 x 2048-track x T=150 operating point (~62 GB
    of activations) into a single 16 GB chip (docs/BENCHMARKS.md round 3).

    Composes with the mesh exactly like ``make_train_step``: microbatch
    arrays keep batch over ``data`` and track/query sets over ``seq``.
    """
    loss_fn_impl = (
        compute_loss_3d
        if model.__class__.__name__ == "TrackAutoEncoder3D"
        else compute_loss_2d
    )
    m = num_microbatches

    def step(state, batch):
        def loss_fn(params, mb):
            predictions = model.apply({"params": params}, mb)
            loss_dict = loss_fn_impl(predictions, mb)
            return loss_dict["total_loss"], loss_dict

        def micro(carry, mb):
            grads_acc, loss_acc, pos_acc, vis_acc, den_acc = carry
            (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb
            )
            # Visible-mass weight: microbatch losses normalize by their own
            # CLAMPED mask sum (losses.py: max(mass, 1)), so multiplying by
            # that same clamped value restores the raw numerator exactly —
            # including the all-occluded case, where the unmasked BCE term
            # is nonzero at mass 0. The accumulated DENOMINATOR must be the
            # TRUE mass though (clamping it per-microbatch would dilute the
            # global normalization by +1 per empty microbatch vs the
            # full-batch step's max(global_mass, 1)).
            mass = jnp.sum(mb["query_tracks_visible"].astype(jnp.float32))
            den = jnp.maximum(mass, 1.0)
            grads_acc = jax.tree.map(
                lambda a, g: a + den * g, grads_acc, grads
            )
            return (
                grads_acc,
                loss_acc + den * loss,
                pos_acc + den * ld["position_loss"],
                vis_acc + den * ld["visible_loss"],
                den_acc + mass,
            ), None

        b = next(iter(batch.values())).shape[0]
        if b % m != 0 or b < m:
            raise ValueError(
                f"batch size {b} must be a positive multiple of "
                f"num_microbatches={m} for gradient accumulation"
            )
        stacked = {
            k: v.reshape((m, v.shape[0] // m) + v.shape[1:])
            for k, v in batch.items()
        }
        if mesh is not None:
            # Keep the scan (microbatch) axis unsharded and the per-microbatch
            # batch dim on 'data': without the constraint the partitioner may
            # shard the scan axis, gathering every microbatch eagerly.
            sp = train_batch_spec()
            stacked = {
                k: jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, P(None, *sp.get(k, P())))
                )
                for k, v in stacked.items()
            }
        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss, pos, vis, den_total), _ = jax.lax.scan(
            micro, (zeros, 0.0, 0.0, 0.0, 0.0), stacked
        )
        den_total = jnp.maximum(den_total, 1.0)  # matches losses.py's clamp
        grads = jax.tree.map(lambda g: g / den_total, grads)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        lr = (
            schedule(state.step)
            if schedule is not None
            else jnp.zeros((), jnp.float32)
        )
        metrics = {
            "train/loss": loss / den_total,
            "train/position_loss": pos / den_total,
            "train/visible_loss": vis / den_total,
            "train/learning_rate": lr,
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    specs = train_batch_spec()
    repl = NamedSharding(mesh, P())
    compiled_cache: dict = {}

    @functools.wraps(step)
    def sharded_step(state, batch):
        cache_key = tuple(sorted(batch))
        compiled = compiled_cache.get(cache_key)
        if compiled is None:
            compiled = jax.jit(
                step,
                in_shardings=(
                    repl,
                    {k: NamedSharding(mesh, specs.get(k, P())) for k in cache_key},
                ),
                out_shardings=(repl, None),
                donate_argnums=(0,) if donate else (),
            )
            compiled_cache[cache_key] = compiled
        return compiled(state, batch)

    sharded_step.cache_size = lambda: sum(
        c._cache_size() for c in compiled_cache.values()
    )
    return sharded_step


def make_eval_step(model, mesh=None):
    """Jitted eval step: forward + loss metrics
    (``eval/{loss,position_loss,visible_loss}``)."""
    loss_fn_impl = (
        compute_loss_3d
        if model.__class__.__name__ == "TrackAutoEncoder3D"
        else compute_loss_2d
    )

    def step(params, batch):
        predictions = model.apply({"params": params}, batch)
        loss_dict = loss_fn_impl(predictions, batch)
        metrics = {
            "eval/loss": loss_dict["total_loss"],
            "eval/position_loss": loss_dict["position_loss"],
            "eval/visible_loss": loss_dict["visible_loss"],
        }
        return metrics, predictions

    if mesh is None:
        return jax.jit(step)

    specs = train_batch_spec()
    repl = NamedSharding(mesh, P())
    compiled_cache: dict = {}

    def sharded_step(params, batch):
        cache_key = tuple(sorted(batch))
        compiled = compiled_cache.get(cache_key)
        if compiled is None:
            compiled = jax.jit(
                step,
                in_shardings=(
                    repl,
                    {k: NamedSharding(mesh, specs.get(k, P())) for k in cache_key},
                ),
            )
            compiled_cache[cache_key] = compiled
        return compiled(params, batch)

    return sharded_step
