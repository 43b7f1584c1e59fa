"""Reference-layout full-checkpoint drill (VERDICT r2 #6).

The strongest real-weight readiness proof available in a zero-egress
environment: synthesize checkpoints in the EXACT on-disk layouts the
reference ships —

* a complete flat ``.npz`` for 3DSPA in the reference's param tree
  (inference.py:450-508), including the square [768,768]/[256,256]
  feature-projection kernels its module declarations would produce
  (track_autoencoder_3d.py:76-79) and, for TRAJAN-2D, the declared-but-
  unused ``input_readout_token`` (track_autoencoder.py:147, Q5);
* a VDA-layout ``.pth`` state_dict including AnimateDiff-style temporal
  motion modules (the released ``video_depth_anything_vitb.pth`` layout) —

then run checkpoint -> pipeline -> predictions.npz end to end and require a
clean structure diff. If the released ``3dspa_ckpt.npz`` ever arrives, it
takes exactly this path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdspa.infer.checkpoint import (
    check_params_structure,
    flatten_params,
    load_checkpoint,
    save_checkpoint_npz,
    unflatten_params,
)
from tdspa.models import TrackAutoEncoder, TrackAutoEncoder3D
from tdspa.utils.testing import tiny_model_3d


def _full_size_init_shapes(model, num_coords, with_features):
    """Param tree (as ShapeDtypeStructs) of the FULL-SIZE model via
    eval_shape — a pure trace, no compile, so full hyperparams are cheap."""
    T = model.num_output_frames
    f32 = jnp.float32
    batch = {
        "support_tracks": jax.ShapeDtypeStruct((1, 8, T, num_coords), f32),
        "support_tracks_visible": jax.ShapeDtypeStruct((1, 8, T, 1), f32),
        "query_points": jax.ShapeDtypeStruct((1, 4, num_coords + 1), f32),
        "boundary_frame": jax.ShapeDtypeStruct((1,), jnp.int32),
    }
    if with_features:
        batch["dino_features"] = jax.ShapeDtypeStruct((1, 8, T, 768), f32)
        batch["depth_features"] = jax.ShapeDtypeStruct((1, 8, T, 256), f32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.eval_shape(model.init, key, batch)["params"]


def _reference_layout_flat(shapes, square_projections: bool) -> dict:
    """Zero-filled flat dict in the reference's on-disk layout."""
    flat = flatten_params(
        jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    )
    if square_projections:
        # What the reference's Dense(768)/Dense(256) declarations would have
        # stored (track_autoencoder_3d.py:76-79).
        flat["dino_projection/kernel"] = np.zeros((768, 768), np.float32)
        flat["dino_projection/bias"] = np.zeros((768,), np.float32)
        flat["depth_projection/kernel"] = np.zeros((256, 256), np.float32)
        flat["depth_projection/bias"] = np.zeros((256,), np.float32)
    return flat


def test_full_size_3dspa_reference_npz_structure(tmp_path):
    """Full-hyperparameter 3DSPA: reference-layout npz (square projections)
    -> load_checkpoint(slice) -> structure diff vs model.init is CLEAN."""
    model = TrackAutoEncoder3D()  # full size: T=150, 384-wide tokens, ~94M
    shapes = _full_size_init_shapes(model, num_coords=3, with_features=True)
    flat = _reference_layout_flat(shapes, square_projections=True)

    path = tmp_path / "3dspa_ckpt.npz"
    np.savez_compressed(path, **flat)  # zeros compress; full file loads real

    with pytest.raises(ValueError, match="projection_policy"):
        load_checkpoint(str(path))  # default policy errors actionably

    params = load_checkpoint(str(path), projection_policy="slice")
    problems = check_params_structure(
        jax.tree.map(lambda s: s, shapes), params
    )
    assert problems == [], problems[:10]
    # Slice direction: dino 768->384 cut, depth 256->384 zero-padded.
    assert params["dino_projection"]["kernel"].shape == (768, 384)
    assert params["depth_projection"]["kernel"].shape == (256, 384)


def test_full_size_trajan2d_npz_roundtrip_and_q5_semantics(tmp_path):
    """TRAJAN-2D full-size layout round-trips; Q5 disposition pinned.

    The reference *declares* ``input_readout_token`` but never calls it
    (track_autoencoder.py:147, 230-232). Flax linen materializes params
    lazily — an uncalled submodule contributes nothing — so the reference's
    own ``model.init`` tree does NOT contain it, and neither does ours
    (structural parity is with the reference's init, not its source text).
    A checkpoint that nevertheless carried it would surface as a warning-
    level 'unexpected key', same as the reference's structure check."""
    model = TrackAutoEncoder()  # full size 2D
    shapes = _full_size_init_shapes(model, num_coords=2, with_features=False)
    assert "input_readout_token" not in shapes  # lazy flax: uncalled == absent

    flat = _reference_layout_flat(shapes, square_projections=False)
    path = tmp_path / "trajan_ckpt.npz"
    np.savez_compressed(path, **flat)
    params = load_checkpoint(str(path))
    assert check_params_structure(shapes, params) == []

    # An extra Q5 param in a checkpoint degrades to a warning, not a crash.
    flat["input_readout_token/state_init"] = np.zeros((1, 256), np.float32)
    path2 = tmp_path / "trajan_ckpt_q5.npz"
    np.savez_compressed(path2, **flat)
    params2 = load_checkpoint(str(path2))
    problems = check_params_structure(shapes, params2)
    assert problems == ["Unexpected key .input_readout_token in checkpoint"]


def test_reference_checkpoints_to_predictions_npz(tmp_path):
    """End-to-end drill: reference-layout 3DSPA npz + VDA-layout .pth (with
    motion modules) -> InferencePipeline(projection_policy='slice') ->
    predictions.npz. Tiny hyperparams (CPU test budget); the layout
    transformations are exactly the full-size ones."""
    torch = pytest.importorskip("torch")
    from tests.unit.test_vda_convert import (
        FEATURES,
        HEADS,
        HIDDEN,
        IMG,
        LAYER_IDXS,
        LAYERS,
        OUT_CHANNELS,
        PATCH,
        _TorchVDAOracle,
    )
    from tdspa.features.depth import VideoDepthEstimator
    from tdspa.features.dino import DinoFeatureExtractor
    from tdspa.features.tracks import StaticGridProvider
    from tdspa.features.vit import ViTConfig
    from tdspa.infer.pipeline import InferencePipeline, save_results

    T = 8
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (T, 32, 40, 3)).astype(np.uint8)

    # --- VDA-layout .pth with motion modules -> native depth provider.
    torch.manual_seed(0)
    oracle = _TorchVDAOracle(with_motion=True).eval()
    pth = str(tmp_path / "video_depth_anything_vitb.pth")
    torch.save(oracle.state_dict(), pth)

    class TinyVDA(VideoDepthEstimator):
        def __call__(self, video, input_size: int = IMG):
            return super().__call__(video, input_size=input_size)

    depth_provider = TinyVDA.from_checkpoint(
        pth,
        vit_config=ViTConfig(hidden_size=HIDDEN, num_layers=LAYERS,
                             num_heads=HEADS, patch_size=PATCH,
                             image_size=IMG),
        head_cfg={"features": FEATURES, "out_channels": list(OUT_CHANNELS),
                  "layer_idxs": list(LAYER_IDXS)},
        dtype=jnp.float32,
        frame_chunk=4,
    )
    assert depth_provider.head.use_motion_modules  # inferred from the .pth

    model = tiny_model_3d(T, use_dino=True, use_depth=True)
    dino = DinoFeatureExtractor(model_name="nonexistent/tiny")  # random init
    common = dict(
        num_output_frames=T, use_dino=True, use_depth=True,
        num_query_points=4, num_support_tracks=8,
        track_provider=StaticGridProvider(grid_size=4),
        dino_extractor=dino, depth_provider=depth_provider,
        model=model, upload_chunk_frames=0, seed=0,
    )

    # --- Produce a correctly-structured params tree, then rewrite it into
    # the reference's on-disk layout (square projections, flat keys).
    boot = InferencePipeline(**common)
    boot.run_on_frames(video)  # random init; fixes the real tree structure
    init_params = boot.params

    flat = flatten_params(jax.tree.map(np.asarray, init_params))
    ttd = model.track_token_dim
    rng2 = np.random.default_rng(1)
    sq_dino = rng2.normal(size=(768, 768)).astype(np.float32) * 0.02
    sq_depth = rng2.normal(size=(256, 256)).astype(np.float32) * 0.02
    # Plant the functional weights in the slice the adapter keeps, so the
    # loaded model provably computes with checkpoint weights.
    sq_dino[:, :ttd] = flat["dino_projection/kernel"]
    sq_depth[:, :ttd] = flat["depth_projection/kernel"]
    flat["dino_projection/kernel"] = sq_dino
    flat["dino_projection/bias"] = np.pad(
        flat["dino_projection/bias"], (0, 768 - ttd)
    )
    flat["depth_projection/kernel"] = sq_depth
    flat["depth_projection/bias"] = np.pad(
        flat["depth_projection/bias"], (0, 256 - ttd)
    )
    ckpt = str(tmp_path / "3dspa_ckpt.npz")
    np.savez(ckpt, **flat)

    # --- The drill: checkpoint in, predictions.npz out.
    pipe = InferencePipeline(
        checkpoint_path=ckpt, projection_policy="slice", **common
    )
    results = pipe.run_on_frames(video)

    problems = check_params_structure(init_params, pipe.params)
    assert problems == [], problems[:10]

    # The adapter kept exactly the planted slice: outputs must equal the
    # original params' outputs bit-for-bit.
    np.testing.assert_array_equal(
        np.asarray(results["predictions"].tracks),
        np.asarray(boot.run_on_frames(video)["predictions"].tracks),
    )

    out = tmp_path / "out"
    save_results(results, str(out))
    data = np.load(out / "predictions.npz")
    assert set(data.files) == {
        "tracks_3d", "visible_logits", "query_tracks", "support_tracks",
    }
    assert np.isfinite(data["tracks_3d"]).all()


def test_flat_npz_is_reference_loader_compatible(tmp_path):
    """The flat writer's output parses with the reference's own unflatten
    algorithm (inference.py:450-461) — transcribed here verbatim-in-spirit:
    split on '/', nested dict insert."""
    tree = {"a": {"b": np.ones((2, 3)), "c": {"d": np.zeros((4,))}}}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint_npz(path, tree)
    data = np.load(path)

    result = {}
    for key in data.files:  # reference _unflatten_params shape
        parts = key.split("/")
        node = result
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    assert result.keys() == tree.keys()
    np.testing.assert_array_equal(result["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(
        result["a"]["c"]["d"], tree["a"]["c"]["d"]
    )
    # And our own reader agrees with itself.
    again = unflatten_params({k: data[k] for k in data.files})
    assert check_params_structure(tree, again) == []
