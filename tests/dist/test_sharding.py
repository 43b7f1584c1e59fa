"""Distributed-without-a-cluster: sharded == single-device on an 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdspa.parallel import make_mesh
from tdspa.parallel.shardings import (
    query_sharded_batch_spec,
    shard_batch,
    train_batch_spec,
)
from tdspa.train import create_model_state, make_eval_step, make_train_step
from tdspa.utils.testing import TINY_3D, synthetic_batch, tiny_model_3d

T = 10

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@requires_8
def test_mesh_construction():
    mesh = make_mesh(seq=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "seq")
    full = make_mesh()
    assert full.devices.shape == (8, 1)


@requires_8
def test_dp_train_step_matches_single_device():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=8, num_support=8, num_queries=8, num_frames=T)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, use_dino=False, use_depth=False,
        **TINY_3D,
    )

    single = make_train_step(model, tx, sched, donate=False)
    s1, m1 = single(state, batch)

    mesh = make_mesh(seq=2)
    sharded_step = make_train_step(model, tx, sched, mesh=mesh, donate=False)
    sharded_batch = shard_batch(mesh, batch)
    s2, m2 = sharded_step(state, sharded_batch)

    np.testing.assert_allclose(
        float(m1["train/loss"]), float(m2["train/loss"]), rtol=1e-5
    )
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@requires_8
def test_query_sharded_forward_matches_replicated():
    rng = jax.random.PRNGKey(1)
    # batch=1 single-video regime: parallelism comes from tracks/queries.
    batch = synthetic_batch(
        rng, batch=1, num_support=16, num_queries=16, num_frames=T
    )
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    variables = jax.jit(model.init)(rng, batch)

    ref = jax.jit(model.apply)(variables, batch)

    mesh = make_mesh(seq=2)
    qbatch = shard_batch(mesh, batch, query_sharded_batch_spec())
    out = jax.jit(model.apply)(variables, qbatch)
    np.testing.assert_allclose(
        np.asarray(ref.tracks), np.asarray(out.tracks), atol=1e-5
    )


@requires_8
def test_eval_step_on_mesh():
    rng = jax.random.PRNGKey(2)
    batch = synthetic_batch(rng, batch=8, num_frames=T)
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    variables = jax.jit(model.init)(rng, batch)
    mesh = make_mesh()
    eval_step = make_eval_step(model, mesh=mesh)
    metrics, _ = eval_step(variables["params"], shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["eval/loss"]))


@requires_8
def test_train_batch_spec_covers_all_keys():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=8, num_frames=T, with_features=True)
    specs = train_batch_spec()
    assert set(batch.keys()) <= set(specs.keys())


@requires_8
def test_quantized_forward_sharded_matches_single_device():
    """int8 dynamic quantization composes with mesh sharding: per-token
    activation scales and per-feature weight scales are local to each
    shard's rows, so the sharded forward matches to within an int8
    rounding bucket (different tilings may reassociate the max/round by
    1 ulp and flip a handful of buckets — not bit-identical)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(
        rng, batch=8, num_support=8, num_queries=8, num_frames=T
    )
    model = tiny_model_3d(T, use_dino=False, use_depth=False, quantize=True)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    out1 = jax.jit(model.apply)({"params": params}, batch)

    mesh = make_mesh()
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }
    out2 = jax.jit(model.apply)({"params": params}, sharded)
    a, b = np.asarray(out1.tracks), np.asarray(out2.tracks)
    np.testing.assert_allclose(a, b, atol=0.05)
    assert np.mean(np.abs(a - b) < 1e-6) > 0.99  # almost all exact


def test_quant_matmul_row_sharded_matches_replicated():
    """The fused-quant kernel's custom_partitioning: token-axis-sharded
    input == unsharded result (weights replicate; each device quantizes
    and matmuls its local rows)."""
    from jax.sharding import NamedSharding, PartitionSpec

    import tdspa.kernels.quant_matmul as kq

    old = kq.INTERPRET_DEFAULT
    kq.INTERPRET_DEFAULT = True
    try:
        mesh = make_mesh()
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 256)) * 2.0
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 512)) * 0.1
        ref = np.asarray(kq.quant_matmul(x, w))
        xs = jax.device_put(
            x, NamedSharding(mesh, PartitionSpec(("data", "seq"), None))
        )
        with mesh:
            got = np.asarray(jax.jit(kq.quant_matmul)(xs, w))
        np.testing.assert_allclose(ref, got, atol=1e-4)
    finally:
        kq.INTERPRET_DEFAULT = old
