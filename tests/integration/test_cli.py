"""CLI surfaces: train (tiny synthetic), evaluate (synthetic gt), visualize."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tdspa.utils.cache import fingerprinted_cache_dir

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENV = dict(
    os.environ,
    PALLAS_AXON_POOL_IPS="",
    JAX_PLATFORMS="cpu",
    PYTHONPATH=REPO,
    # Host-fingerprinted: the raw /tmp path is shared across rounds' hosts
    # and foreign XLA:CPU AOT entries segfault at load (CLAUDE.md).
    JAX_COMPILATION_CACHE_DIR=fingerprinted_cache_dir("/tmp/tdspa_jax_cache"),
)


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m"] + args,
        env=ENV, capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )


def test_train_cli_tiny(tmp_path):
    res = _run([
        "tdspa.cli.train", "--model_type=3dspa", "--num_epochs=1",
        "--batch_size=2", "--num_output_frames=10", "--max_steps=2",
        "--tiny_model", f"--checkpoint_dir={tmp_path}/ckpt", "--nouse_wandb",
        "--nouse_dino", "--nouse_depth", "--eval_freq=1000", "--save_freq=2",
        "--num_support_tracks=8", "--num_query_tracks=8", "--log_freq=1",
        f"--log_jsonl={tmp_path}/metrics.jsonl",
        f"--profile_dir={tmp_path}/trace",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any("train/loss" in l for l in lines)
    # Orbax checkpoint directory written at step 2.
    assert os.path.isdir(tmp_path / "ckpt" / "2")
    # --profile_dir wrote a jax.profiler (Perfetto/XProf) trace
    # (SURVEY §5 tracing row): the dump lands under plugins/profile/<ts>/.
    trace_files = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path / "trace") for f in files
    ]
    assert trace_files, "profile_dir produced no trace files"


def test_evaluate_cli_synthetic(tmp_path):
    # Build a fake TAPVid-3D source dir + a tiny flat-npz checkpoint.
    rng = np.random.default_rng(0)
    source_dir = tmp_path / "data" / "mysource"
    source_dir.mkdir(parents=True)
    for i in range(2):
        n, t = 6, 10
        np.savez(
            source_dir / f"video_{i}.npz",
            tracks_XYZ=rng.normal(size=(n, t, 3)).astype(np.float32) + [0, 0, 5],
            visibility=np.ones((n, t), np.float32),
            queries_xyt=np.stack(
                [rng.uniform(0, 64, n), rng.uniform(0, 64, n),
                 rng.integers(0, t, n).astype(float)], axis=1,
            ).astype(np.float32),
            fx_fy_cx_cy=np.array([100.0, 100.0, 32.0, 32.0], np.float32),
        )

    # Tiny checkpoint: init a tiny model and save flat npz. Done in-process.
    import jax
    from tdspa.eval.harness import build_eval_batch
    from tdspa.infer.checkpoint import save_checkpoint_npz
    from tdspa.utils.testing import tiny_model_3d
    from tdspa.data.providers import NpzDirectoryProvider

    model = tiny_model_3d(10, use_dino=False, use_depth=False)
    ex = NpzDirectoryProvider(str(source_dir))[0]
    batch, _ = build_eval_batch(ex, num_output_frames=10, track_bucket=8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ckpt = tmp_path / "tiny_ckpt.npz"
    save_checkpoint_npz(str(ckpt), variables["params"])

    # Drive the REAL CLI end-to-end with the tiny config.
    res = _run([
        "tdspa.cli.evaluate", f"--checkpoint_path={ckpt}",
        f"--dataset_path={tmp_path}/data", f"--output_dir={tmp_path}/out",
        "--data_sources=mysource", "--num_output_frames=10",
        "--track_bucket=8", "--nouse_dino", "--nouse_depth", "--tiny_model",
        "--depth_scalings=median",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    loaded = json.loads((tmp_path / "out" / "results.json").read_text())
    assert "average_jaccard" in loaded["per_source"]["mysource"]["median"]
    # The evaluated population is recorded (additive field, docs/PARITY.md):
    # tapnet splits are unavailable here, so the fallback must be explicit.
    assert loaded["split"] == {"mysource": "all_files"}


def test_export_cli_tiny(tmp_path):
    """AOT export CLI: artifact + manifest land, and the artifact runs."""
    res = _run([
        "tdspa.cli.export", "--tiny_model",
        f"--output_path={tmp_path}/tail.shlo",
        "--num_output_frames=8", "--video_height=32", "--video_width=32",
        "--tracking_grid_size=4", "--num_query_points=4",
        "--num_support_tracks=8", "--dino_dim=8",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    manifest = json.loads((tmp_path / "tail.shlo.json").read_text())
    assert manifest["num_tracks"] == 16
    assert manifest["num_queries"] == 4
    assert manifest["platforms"] == ["cpu"]

    # The artifact is runnable from the manifest alone (random-init weights
    # regenerated in-process: the artifact itself is weight-free).
    import jax
    import jax.numpy as jnp

    from tdspa.infer.export import load_exported
    from tdspa.utils.testing import tiny_model_3d

    t, n = manifest["num_output_frames"], manifest["num_tracks"]
    h, w = manifest["video_hw"]
    model = tiny_model_3d(t, use_dino=True, use_depth=True, dino_feature_dim=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    tracks_2d = jax.random.uniform(keys[0], (n, t, 2), maxval=w - 1.0)
    visible = (jax.random.uniform(keys[1], (n, t, 1)) > 0.2).astype(jnp.float32)
    # DINOv2 patch-14 grid of the patch-multiple resize (export.py default).
    dino_grid = jax.random.normal(keys[2], (t, h // 14, w // 14, 8))
    depth_maps = jax.random.uniform(keys[3], (t, h, w, 1), minval=0.5, maxval=4.0)
    from tdspa.data.batch_prep import split_and_sample_queries

    batch = split_and_sample_queries(
        jax.random.PRNGKey(0), jnp.zeros((n, t, 3)), jnp.ones((n, t, 1)),
        manifest["num_support"], manifest["num_queries"], t,
        dino_features=jnp.zeros((n, t, 8)),
        depth_features=jnp.zeros((n, t, 256)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(42), batch)["params"]
    out = load_exported(str(tmp_path / "tail.shlo")).call(
        params, jnp.uint32(0), tracks_2d, visible, dino_grid, depth_maps
    )
    assert out["tracks"].shape == (1, 4, t, 3)
    assert bool(jnp.all(jnp.isfinite(out["tracks"])))


def test_visualize_cli(tmp_path):
    pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    T, N, H, W = 4, 5, 32, 32
    np.savez(
        tmp_path / "viz.npz",
        coords=rng.normal(size=(T, N, 3)).astype(np.float32) + [0, 0, 5],
        coords_score=rng.uniform(size=(T, N)).astype(np.float32),
        video=rng.uniform(size=(T, 3, H, W)).astype(np.float32),
        intrinsics=np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32),
        extrinsics=np.eye(4, dtype=np.float32),
    )
    res = _run([
        "tdspa.cli.visualize", f"--npz_path={tmp_path}/viz.npz", "--save_frames",
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    assert (tmp_path / "viz_visualized.mp4").exists()
    assert (tmp_path / "viz_visualized" / "frame_00000.png").exists()
