"""Checkpoint I/O: the three reference .npz layouts + orbax round trip."""

import numpy as np
import pytest

from tdspa.infer.checkpoint import (
    check_params_structure,
    flatten_params,
    load_checkpoint,
    save_checkpoint_npz,
    unflatten_params,
)

PARAMS = {
    "dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3),
              "bias": np.zeros(3, np.float32)},
    "stack": {"layer_0": {"scale": np.ones(4, np.float32)}},
}


def _assert_tree_equal(a, b):
    assert sorted(a.keys()) == sorted(b.keys())
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_flatten_unflatten_roundtrip():
    flat = flatten_params(PARAMS)
    assert "dense/kernel" in flat and "stack/layer_0/scale" in flat
    _assert_tree_equal(unflatten_params(flat), PARAMS)


def test_npz_params_pickle_layout(tmp_path):
    path = str(tmp_path / "ckpt_params.npz")
    np.savez(path, params=np.asarray(PARAMS, dtype=object))
    _assert_tree_equal(load_checkpoint(path), PARAMS)


def test_npz_optimizer_target_layout(tmp_path):
    path = str(tmp_path / "ckpt_opt.npz")
    np.savez(path, optimizer=np.asarray({"target": PARAMS}, dtype=object))
    _assert_tree_equal(load_checkpoint(path), PARAMS)


def test_npz_flat_layout_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt_flat.npz")
    save_checkpoint_npz(path, PARAMS)
    _assert_tree_equal(load_checkpoint(path), PARAMS)


def test_missing_checkpoint_raises():
    with pytest.raises(FileNotFoundError):
        load_checkpoint("/nonexistent/ckpt.npz")


def test_check_params_structure():
    actual = {
        "dense": {"kernel": np.zeros((2, 3)), "bias": np.zeros(3)},
        "stack": {"layer_0": {"scale": np.ones(5)}},  # wrong shape
    }
    problems = check_params_structure(PARAMS, actual)
    assert any("Shape mismatch at stack.layer_0.scale" in p for p in problems)
    missing = check_params_structure(PARAMS, {"dense": actual["dense"]})
    assert any("missing" in p for p in missing)
    assert check_params_structure(PARAMS, PARAMS) == []


def test_orbax_roundtrip(tmp_path):
    from tdspa.infer.checkpoint import OrbaxCheckpointer

    ckptr = OrbaxCheckpointer(str(tmp_path / "orbax"))
    tree = {"params": PARAMS, "opt_state": {"count": np.array(3, np.int32)}, "step": 7}
    ckptr.save(7, tree)
    assert ckptr.latest_step() == 7
    restored = ckptr.restore(template=tree)
    _assert_tree_equal(restored["params"], PARAMS)
    assert int(restored["step"]) == 7


def _reference_layout_params():
    """A tree carrying the reference's square projection kernels
    (track_autoencoder_3d.py:76-79: Dense(768)/Dense(256) — never functional,
    see adapt_reference_projections)."""
    return {
        "dino_projection": {"kernel": np.ones((768, 768), np.float32),
                            "bias": np.zeros(768, np.float32)},
        "depth_projection": {"kernel": np.ones((256, 256), np.float32),
                             "bias": np.zeros(256, np.float32)},
        "other": {"kernel": np.ones((4, 4), np.float32)},
    }


def test_reference_projection_layout_errors_actionably(tmp_path):
    path = str(tmp_path / "ref_layout.npz")
    save_checkpoint_npz(path, _reference_layout_params())
    with pytest.raises(ValueError, match="projection_policy='slice'"):
        load_checkpoint(path)


def test_reference_projection_layout_slices(tmp_path):
    path = str(tmp_path / "ref_layout.npz")
    save_checkpoint_npz(path, _reference_layout_params())
    params = load_checkpoint(path, projection_policy="slice")
    assert params["dino_projection"]["kernel"].shape == (768, 384)
    assert params["dino_projection"]["bias"].shape == (384,)
    assert params["depth_projection"]["kernel"].shape == (256, 384)
    # Unrelated square kernels untouched.
    assert params["other"]["kernel"].shape == (4, 4)


def test_rebuild_projection_layout_passes_untouched(tmp_path):
    path = str(tmp_path / "native_layout.npz")
    native = {
        "dino_projection": {"kernel": np.ones((768, 384), np.float32),
                            "bias": np.zeros(384, np.float32)},
    }
    save_checkpoint_npz(path, native)
    params = load_checkpoint(path)  # policy=error must not trip
    assert params["dino_projection"]["kernel"].shape == (768, 384)
