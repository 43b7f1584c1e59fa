"""Train step/state: loss math oracle, step runs and descends, resume."""

import jax
import jax.numpy as jnp
import numpy as np

from tdspa.train import (
    compute_loss_3d,
    create_learning_rate_schedule,
    create_model_state,
    make_eval_step,
    make_train_step,
)
from tdspa.utils.testing import TINY_3D, synthetic_batch, tiny_model_3d

T = 10


def test_loss_matches_reference_formula():
    class Preds:
        tracks = jnp.ones((1, 2, 3, 3)) * 2.0
        visible_logits = jnp.zeros((1, 2, 3, 1))

    targets = {
        "query_tracks": jnp.ones((1, 2, 3, 3)),
        "query_tracks_visible": jnp.concatenate(
            [jnp.ones((1, 1, 3, 1)), jnp.zeros((1, 1, 3, 1))], axis=1
        ),
    }
    out = compute_loss_3d(Preds(), targets)
    # visible mass = 3; L1 error 1.0 per coord * 3 coords * 3 frames (track 0)
    assert float(out["position_loss"]) == 9.0 / 3.0
    # BCE at logit 0 vs target 1 or 0 is log(2) everywhere, summed over all
    # 6 elements, normalized by visible mass 3.
    np.testing.assert_allclose(
        float(out["visible_loss"]), 6 * np.log(2) / 3, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out["total_loss"]),
        5000.0 * 3.0 + 1e-8 * 6 * np.log(2) / 3,
        rtol=1e-6,
    )


def test_schedule_warmup_and_decay():
    sched = create_learning_rate_schedule(1e-3, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(60)) < 1e-3
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-9)


def test_train_step_decreases_loss():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=2, num_frames=T, num_coords=3)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, use_dino=False, use_depth=False,
        **TINY_3D,
    )
    step = make_train_step(model, tx, sched)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    assert float(metrics["train/learning_rate"]) > 0


def test_eval_step_metric_names():
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=1, num_frames=T, num_coords=3)
    model = tiny_model_3d(T, use_dino=False, use_depth=False)
    variables = jax.jit(model.init)(rng, batch)
    eval_step = make_eval_step(model)
    metrics, preds = eval_step(variables["params"], batch)
    assert sorted(metrics.keys()) == [
        "eval/loss", "eval/position_loss", "eval/visible_loss",
    ]
    assert preds.tracks.shape[-1] == 3


def test_train_step_trajan_2d():
    from tdspa.utils.testing import TINY_2D

    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=2, num_frames=T, num_coords=2)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="trajan", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, **TINY_2D,
    )
    step = make_train_step(model, tx, sched)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0]


def test_train_loop_smoke(tmp_path):
    from tdspa.data.providers import BatchedTrackDataset, SyntheticTrackProvider
    from tdspa.data.batch_prep import prepare_3d_batch
    from tdspa.train.loop import train
    from tdspa.utils.testing import TINY_3D

    provider = SyntheticTrackProvider(num_videos=4, num_tracks=12, num_frames=T)

    def prepare(example, seed=None):
        return prepare_3d_batch(
            example, num_support_tracks=4, num_query_tracks=4, num_frames=T,
            use_dino=False, use_depth=False, seed=seed,
        )

    ds = BatchedTrackDataset(provider, batch_size=2, prepare_fn=prepare)
    state = train(
        ds,
        eval_ds=ds,
        model_type="3dspa",
        num_epochs=1,
        num_output_frames=T,
        use_dino=False,
        use_depth=False,
        eval_freq=2,
        save_freq=2,
        log_freq=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_steps=2,
        **TINY_3D,
    )
    assert int(state.step) == 2
    # Checkpoint was written and resume picks it up.
    state2 = train(
        ds,
        model_type="3dspa",
        num_epochs=1,
        num_output_frames=T,
        use_dino=False,
        use_depth=False,
        eval_freq=100,
        save_freq=100,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_steps=3,
        **TINY_3D,
    )
    assert int(state2.step) == 3


def test_grad_accum_step_matches_full_batch_step():
    """Accumulated microbatch gradients == the full-batch step (same update,
    same metrics), since every loss is a mean and microbatches are equal."""
    from tdspa.train import make_grad_accum_step

    rng = jax.random.PRNGKey(3)
    batch = synthetic_batch(rng, batch=4, num_frames=T, num_coords=3)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, use_dino=False, use_depth=False,
        **TINY_3D,
    )
    full = make_train_step(model, tx, sched, donate=False)
    accum = make_grad_accum_step(
        model, tx, sched, num_microbatches=2, donate=False
    )

    s_full, m_full = full(state, batch)
    s_acc, m_acc = accum(state, batch)

    np.testing.assert_allclose(
        float(m_acc["train/loss"]), float(m_full["train/loss"]), rtol=1e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        s_acc.params, s_full.params,
    )
    # And it descends over repeated steps like the plain step.
    losses = []
    for _ in range(4):
        s_acc, m = accum(s_acc, batch)
        losses.append(float(m["train/loss"]))
    assert losses[-1] < losses[0]


def test_grad_accum_rejects_indivisible_batch():
    """Batch size not a positive multiple of num_microbatches must fail
    with a clear ValueError, not an opaque reshape mismatch (round-3
    advisor finding)."""
    import pytest

    from tdspa.train import make_grad_accum_step

    rng = jax.random.PRNGKey(3)
    batch = synthetic_batch(rng, batch=3, num_frames=T, num_coords=3)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, use_dino=False, use_depth=False,
        **TINY_3D,
    )
    accum = make_grad_accum_step(
        model, tx, sched, num_microbatches=2, donate=False
    )
    with pytest.raises(ValueError, match="multiple of num_microbatches"):
        accum(state, batch)


def test_train_step_decreases_loss_bf16_compute():
    """--bf16 training recipe: bf16 matmuls, f32 params/opt-state/losses.
    The step must still descend and keep f32 parameters."""
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(rng, batch=2, num_frames=T, num_coords=3)
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, use_dino=False, use_depth=False,
        dtype=jnp.bfloat16, **TINY_3D,
    )
    leaves = jax.tree.leaves(state.params)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    step = make_train_step(model, tx, sched)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_grad_accum_matches_full_batch_with_empty_microbatch():
    """An all-occluded microbatch must not break full-batch equivalence:
    its unmasked-BCE numerator still counts, but the global normalization
    is max(global_mass, 1) — NOT global_mass + 1 per empty microbatch
    (the bug: per-microbatch clamped denominators accumulated)."""
    from tdspa.train import make_grad_accum_step

    rng = jax.random.PRNGKey(3)
    batch = synthetic_batch(rng, batch=4, num_frames=T, num_coords=3)
    # Zero out the SECOND microbatch's visible mass (examples 2-3).
    vis = np.asarray(batch["query_tracks_visible"]).copy()
    vis[2:] = 0.0
    batch = dict(batch, query_tracks_visible=jnp.asarray(vis))
    state, model, tx, sched = create_model_state(
        rng, batch, model_type="3dspa", learning_rate=1e-3, warmup_steps=1,
        total_steps=100, num_output_frames=T, use_dino=False, use_depth=False,
        **TINY_3D,
    )
    full = make_train_step(model, tx, sched, donate=False)
    accum = make_grad_accum_step(
        model, tx, sched, num_microbatches=2, donate=False
    )
    s_full, m_full = full(state, batch)
    s_acc, m_acc = accum(state, batch)
    np.testing.assert_allclose(
        float(m_acc["train/loss"]), float(m_full["train/loss"]), rtol=1e-4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        s_acc.params, s_full.params,
    )
