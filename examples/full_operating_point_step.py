"""Full-operating-point training step: batch 64 x 2048 support + 2048 query
tracks x T=150 — the reference's train configuration (train.py:30-36,
data_loader.py defaults), NOT bucket-reduced.

Two modes (VERDICT r2 #4):

* ``--mode=tpu`` (default): one real-chip step on the full-size 3DSPA model
  via gradient accumulation (``--microbatch`` videos per microbatch; peak
  memory = one microbatch's fwd+bwd + a grads accumulator). Microbatch data
  is GENERATED ON DEVICE inside the accumulation scan: the full batch's
  feature tensors are ~60 GB (dino [64,2048,150,768] alone) — they cannot
  exist in HBM at once, and streaming them through the dev tunnel
  (~36 MB/s) would only measure the relay. On a production host the same
  step is fed per-microbatch from pinned host memory at GB/s; the recorded
  number is the chip-side step time that host would see. Reports step time,
  loss descent over ``--steps`` steps, and the HBM breakdown
  (device.memory_stats).

* ``--mode=mesh_cpu``: the seq-sharded path on the 8-virtual-device CPU
  mesh — batch over 'data', the 2048-track/query set axes over 'seq'
  (activation memory / 8 per device), at reference TRACK COUNTS with tiny
  model widths and reduced T (this host has ONE core for all 8 virtual
  devices; full widths at 2048 queries are ~10^14 FLOP/step there — the
  full-width full-size demonstration is the TPU mode). Records a
  loss-descending run through ``make_grad_accum_step(mesh=...)``.
  NOTE: needs XLA_FLAGS --xla_cpu_collective_call_terminate_timeout_seconds
  raised (default 40 s of allowed rendezvous skew is too tight for heavy
  per-device compute sharing one host core).

Usage:
  python examples/full_operating_point_step.py --mode=tpu --steps=3
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/full_operating_point_step.py --mode=mesh_cpu --steps=3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def synth_microbatch(key, b, n_support, n_query, t, coords=3,
                     with_features=True, feat_dtype=jnp.bfloat16):
    """On-device synthetic microbatch (same distributions as
    tdspa.utils.testing.synthetic_batch, feature tensors in bf16)."""
    ks = jax.random.split(key, 8)
    def tracks(k, n):
        center = jax.random.uniform(k, (b, n, 1, coords))
        radius = jax.random.uniform(jax.random.fold_in(k, 1), (b, n, 1, coords)) * 0.1
        phase = jax.random.uniform(jax.random.fold_in(k, 2), (b, n, 1, coords)) * 2 * jnp.pi
        tt = jnp.arange(t)[None, None, :, None] / t
        return center + radius * jnp.sin(2 * jnp.pi * 3 * tt + phase)
    support = tracks(ks[0], n_support)
    query = tracks(ks[1], n_query)
    support_vis = (jax.random.uniform(ks[2], (b, n_support, t, 1)) > 0.2
                   ).astype(jnp.float32)
    query_vis = (jax.random.uniform(ks[3], (b, n_query, t, 1)) > 0.2
                 ).astype(jnp.float32)
    qt = jax.random.randint(ks[4], (b, n_query), 0, t)
    coords_at_t = jnp.take_along_axis(query, qt[..., None, None], axis=-2)[..., 0, :]
    query_points = jnp.concatenate(
        [qt[..., None].astype(jnp.float32), coords_at_t], axis=-1)
    out = {
        "support_tracks": support,
        "support_tracks_visible": support_vis,
        "query_points": query_points,
        "query_tracks": query,
        "query_tracks_visible": query_vis,
        "boundary_frame": jnp.full((b,), t, jnp.int32),
    }
    if with_features:
        out["dino_features"] = (
            jax.random.normal(ks[5], (b, n_support, t, 768), feat_dtype) * 0.1)
        out["depth_features"] = (
            jax.random.normal(ks[6], (b, n_support, t, 256), feat_dtype) * 0.1)
    return out


def run_tpu(args):
    from tdspa.train.losses import compute_loss_3d
    from tdspa.train.state import create_model_state

    t, n = args.num_frames, 2048
    mb, accum = args.microbatch, args.batch_size // args.microbatch
    assert mb * accum == args.batch_size

    key = jax.random.PRNGKey(0)
    dummy = synth_microbatch(key, mb, n, n, t)
    print(f"init: full-size 3DSPA, microbatch {mb} x {accum} accum, "
          f"{n} support + {n} query tracks, T={t}")
    state, model, tx, schedule = create_model_state(
        key, dummy, model_type="3dspa", warmup_steps=1, total_steps=1000,
        num_output_frames=t, use_dino=True, use_depth=True,
        dtype=jnp.bfloat16,
        decoder_scan_chunk_size=args.decoder_scan_chunk_size,
        encoder_scan_chunk_size=args.encoder_scan_chunk_size,
    )
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f}M")

    def loss_fn_of(params, mbatch):
        predictions = model.apply({"params": params}, mbatch)
        return compute_loss_3d(predictions, mbatch)["total_loss"]

    if args.host_accum:
        # One dispatch PER MICROBATCH instead of one giant scan-of-grads
        # program: identical math (the scan is sequential anyway), but each
        # device program runs seconds instead of minutes. Measured need on
        # this rig: the single-dispatch step (32-64 chained fwd+bwd) makes
        # the tunnel's TPU worker crash mid-execution ("worker process
        # crashed or restarted"), reproducibly, while every shorter program
        # runs fine — a long-dispatch limit, not a memory or math problem.
        @jax.jit
        def micro_grads(params, seed_i):
            mbatch = synth_microbatch(
                jax.random.fold_in(jax.random.PRNGKey(0), seed_i), mb, n, n, t)
            loss, grads = jax.value_and_grad(loss_fn_of)(params, mbatch)
            den = jnp.maximum(jnp.sum(mbatch["query_tracks_visible"]), 1.0)
            return jax.tree.map(lambda g: den * g, grads), den * loss, den

        @jax.jit
        def add_trees(acc, upd):
            return jax.tree.map(jnp.add, acc, upd)

        @jax.jit
        def apply(state, grads, loss, den):
            grads = jax.tree.map(lambda g: g / den, grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(params=new_params, opt_state=new_opt,
                                 step=state.step + 1), loss / den

        def host_step(state, seed):
            acc = None
            for i in range(accum):
                out = micro_grads(state.params, seed * accum + i)
                acc = out if acc is None else add_trees(acc, out)
            grads, loss, den = acc
            return apply(state, grads, loss, den)

        jstep = host_step
        print("host-accumulation mode: one dispatch per microbatch")
        t0 = time.perf_counter()
        state, loss = jstep(state, 0)
        l0 = float(loss)
        print(f"step 0 (incl compile): {time.perf_counter()-t0:.1f}s "
              f"loss={l0:.2f}")
        losses = [l0]
        for i in range(1, args.steps):
            t0 = time.perf_counter()
            state, loss = jstep(state, i)
            li = float(loss)
            print(f"step {i}: {time.perf_counter()-t0:.1f}s loss={li:.2f}")
            losses.append(li)
        _print_memory_and_losses(losses)
        return

    def step(state, seed):
        def loss_fn(params, mbatch):
            return loss_fn_of(params, mbatch)

        def micro(carry, i):
            grads_acc, loss_acc, den_acc = carry
            mbatch = synth_microbatch(
                jax.random.fold_in(jax.random.PRNGKey(0), seed * accum + i),
                mb, n, n, t)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, mbatch)
            den = jnp.maximum(jnp.sum(mbatch["query_tracks_visible"]), 1.0)
            grads_acc = jax.tree.map(lambda a, g: a + den * g, grads_acc, grads)
            return (grads_acc, loss_acc + den * loss, den_acc + den), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss, den), _ = jax.lax.scan(
            micro, (zeros, 0.0, 0.0), jnp.arange(accum))
        grads = jax.tree.map(lambda g: g / den, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), loss / den

    jstep = jax.jit(step, donate_argnums=(0,))
    print("compiling (big: expect tens of minutes through the tunnel)...")
    t0 = time.perf_counter()
    state, loss = jstep(state, 0)
    l0 = float(loss)  # host fetch = sync
    print(f"step 0 (incl compile): {time.perf_counter()-t0:.1f}s loss={l0:.2f}")
    losses = [l0]
    for i in range(1, args.steps):
        t0 = time.perf_counter()
        state, loss = jstep(state, i)
        li = float(loss)
        dt = time.perf_counter() - t0
        losses.append(li)
        print(f"step {i}: {dt:.1f}s loss={li:.2f}")
    _print_memory_and_losses(losses)


def _print_memory_and_losses(losses):
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        limit = stats.get("bytes_limit", 0) / 2**30
        print(f"HBM peak {peak:.2f} GiB of {limit:.2f} GiB limit")
        print({k: round(v / 2**30, 3) for k, v in stats.items()
               if "bytes" in k})
    except Exception as e:  # noqa: BLE001 - stats are platform-dependent
        print("memory_stats unavailable:", e)
    print("losses:", [round(x, 2) for x in losses])


def run_mesh_cpu(args):
    from tdspa.parallel.mesh import make_mesh
    from tdspa.parallel.shardings import shard_batch
    from tdspa.train.state import create_model_state
    from tdspa.train.step import make_grad_accum_step

    from tdspa.utils.testing import TINY_3D

    t, n = args.num_frames, 2048
    print(f"mesh_cpu: {jax.device_count()} devices, tiny widths, "
          f"batch {args.batch_size}, {n}+{n} tracks, T={t}")
    key = jax.random.PRNGKey(0)
    batch = jax.device_get(
        synth_microbatch(key, args.batch_size, n, n, t,
                         feat_dtype=jnp.float32))
    state, model, tx, schedule = create_model_state(
        key, jax.tree.map(lambda x: x[:1], batch), model_type="3dspa",
        warmup_steps=1, total_steps=1000, num_output_frames=t,
        use_dino=True, use_depth=True,
        decoder_scan_chunk_size=args.decoder_scan_chunk_size,
        **TINY_3D,
    )
    import math

    mb = args.batch_size // args.grad_accum
    data = math.gcd(mb, max(jax.device_count() // 2, 1))
    mesh = make_mesh(data=data, seq=2)
    print(f"mesh: data={data} seq=2 (microbatch {mb} over data)")
    step = make_grad_accum_step(
        model, tx, schedule, num_microbatches=args.grad_accum, mesh=mesh)
    from jax.sharding import NamedSharding, PartitionSpec

    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
    sharded = shard_batch(mesh, batch)
    losses = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step(state, sharded)
        li = float(metrics["train/loss"])
        losses.append(li)
        print(f"step {i}: {time.perf_counter()-t0:.1f}s loss={li:.2f}")
    print("losses:", [round(x, 2) for x in losses])
    assert losses[-1] < losses[0], "loss did not descend"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["tpu", "mesh_cpu"], default="tpu")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--microbatch", type=int, default=4)
    p.add_argument("--grad_accum", type=int, default=2)
    p.add_argument("--num_frames", type=int, default=150)
    p.add_argument("--decoder_scan_chunk_size", type=int, default=256)
    p.add_argument("--encoder_scan_chunk_size", type=int, default=None)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--host_accum", action="store_true",
                   help="one dispatch per microbatch (identical math; "
                        "avoids multi-minute single dispatches that this "
                        "rig's tunnel worker kills)")
    args = p.parse_args()
    print("devices:", jax.devices())
    if args.mode == "tpu":
        run_tpu(args)
    else:
        run_mesh_cpu(args)


if __name__ == "__main__":
    main()
