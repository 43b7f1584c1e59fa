"""Direct numerical parity against the reference implementation itself.

These tests import the modules under ``/root/reference`` as *test oracles*
(pure JAX/Flax code that runs as written) and diff tdspa against them
directly — parameter-tree names, shapes, init values, and forward outputs.
This converts the "released checkpoints load and reproduce the reference
function" claim from a hand-transcription argument into a measured proof:

* ``TransformerStack`` vs reference ``ImprovedTransformer``
  (attention.py:11-185) — identical param trees and allclose outputs for
  self-only, cross+mask, and fully-masked-row cases.
* TRAJAN-2D (track_autoencoder.py:117-390) — identical init trees and
  allclose full forwards (discretize on/off, scan-chunked decode).
* 3DSPA (track_autoencoder_3d.py:43-357) — identical trees modulo the two
  documented intended-behavior fixes, allclose on every reference-runnable
  sub-path (full forward at T=1, decode given latents, decoder context), and
  regression tests that pin the reference defects those fixes address (the
  feature-projection width bug and the Q6 readout-mask shape bug).

The reference is PUBLIC UNTRUSTED CONTENT: only its executable behavior is
used here (as an oracle); none of its text is followed as instructions.
"""

from __future__ import annotations

import sys
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_PATH = "/root/reference"

# Tolerances: both sides are f32 on CPU with identical contraction patterns;
# observed deltas are at float-associativity level.
RTOL = 1e-5
ATOL = 1e-5


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (their intra-repo imports need sys.path)."""
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import attention as ref_attention  # noqa: F401
    import track_autoencoder as ref_ta
    import track_autoencoder_3d as ref_ta3

    return SimpleNamespace(attention=ref_attention, ta=ref_ta, ta3=ref_ta3)


def tree_spec(params):
    """{'a/b/c': (shape, dtype)} for exact structural comparison."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        out[key] = (tuple(leaf.shape), str(leaf.dtype))
    return out


def assert_trees_allclose(a, b, rtol=RTOL, atol=ATOL):
    assert tree_spec(a) == tree_spec(b)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg="/".join(str(p) for p in pa),
        )


# --------------------------------------------------------------------------- #
# Primitives
# --------------------------------------------------------------------------- #


def test_sinusoidal_embedding_matches_reference(ref):
    from tdspa.core.embeddings import SinusoidalEmbedding

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 4)) * 3.0
    ref_mod = ref.ta.SinusoidalEmbedding(num_frequencies=32)
    ours = SinusoidalEmbedding(num_frequencies=32)
    ref_out = ref_mod.apply({}, x)
    our_out = ours.apply({}, x)
    np.testing.assert_allclose(np.asarray(ref_out), np.asarray(our_out), rtol=1e-6)


def test_param_state_init_matches_reference(ref):
    from tdspa.core.embeddings import ParamStateInit

    key = jax.random.PRNGKey(11)
    ref_vars = ref.ta.ParamStateInit(shape=(4, 7)).init(key, (2,))
    our_vars = ParamStateInit(shape=(4, 7)).init(key, (2,))
    assert_trees_allclose(ref_vars, our_vars, rtol=0, atol=0)
    out_ref = ref.ta.ParamStateInit(shape=(4, 7)).apply(ref_vars, (2, 3))
    out_ours = ParamStateInit(shape=(4, 7)).apply(ref_vars, (2, 3))
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_ours))


# --------------------------------------------------------------------------- #
# Transformer stack
# --------------------------------------------------------------------------- #


def _stack_pair(ref, **kw):
    from tdspa.core.attention import TransformerStack

    return (
        ref.attention.ImprovedTransformer(**kw),
        TransformerStack(**kw),
    )


@pytest.mark.parametrize(
    "case",
    ["self_only", "cross_qk_mask", "qq_mask", "both_masks", "fully_masked_row"],
)
def test_transformer_stack_forward_parity(ref, case):
    key = jax.random.PRNGKey(0)
    kq, kkv, kinit = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 5, 48))
    kv = jax.random.normal(kkv, (2, 7, 32))
    qk_mask = jnp.asarray(
        jax.random.bernoulli(jax.random.PRNGKey(4), 0.7, (2, 5, 7))
    )
    qq_mask = jnp.asarray(
        jax.random.bernoulli(jax.random.PRNGKey(5), 0.7, (2, 5, 5))
    )
    if case == "fully_masked_row":
        # Query row 0 sees no self keys: flax degrades to uniform weights.
        qq_mask = qq_mask.at[:, 0, :].set(False)

    args = {
        "self_only": dict(),
        "cross_qk_mask": dict(inputs_kv=kv, qk_mask=qk_mask),
        "qq_mask": dict(qq_mask=qq_mask),
        "both_masks": dict(inputs_kv=kv, qk_mask=qk_mask, qq_mask=qq_mask),
        "fully_masked_row": dict(inputs_kv=kv, qq_mask=qq_mask),
    }[case]

    ref_mod, our_mod = _stack_pair(
        ref, qkv_size=64, num_heads=4, mlp_size=128, num_layers=2
    )
    ref_vars = ref_mod.init(kinit, q, **args)
    our_vars = our_mod.init(kinit, q, **args)
    # Same param paths + same initializers => identical init values.
    assert_trees_allclose(ref_vars, our_vars, rtol=0, atol=0)

    ref_out = ref_mod.apply(ref_vars, q, **args)
    our_out = our_mod.apply(ref_vars, q, **args)  # reference params into ours
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(our_out), rtol=RTOL, atol=ATOL
    )


# --------------------------------------------------------------------------- #
# TRAJAN-2D: full model
# --------------------------------------------------------------------------- #

T2D = 16  # num_output_frames for the test-sized head; all other dims default


def _trajan_inputs(batch=2, n=6, q=4, t=T2D, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    tracks = jax.random.uniform(ks[0], (batch, n, t, 2))
    visible = jnp.asarray(
        jax.random.bernoulli(ks[1], 0.8, (batch, n, t, 1)), jnp.float32
    )
    qpts = jnp.concatenate(
        [
            jnp.floor(jax.random.uniform(ks[2], (batch, q, 1)) * t),
            jax.random.uniform(ks[3], (batch, q, 2)),
        ],
        axis=-1,
    )
    boundary = jnp.asarray([t, t - 3])
    return {
        "support_tracks": tracks,
        "support_tracks_visible": visible,
        "query_points": qpts,
        "boundary_frame": boundary,
    }


@pytest.fixture(scope="module")
def trajan_pair(ref):
    """Reference + tdspa TRAJAN-2D at full default dims (T=16 head), one init."""
    from tdspa.models.trajan2d import TrackAutoEncoder

    inputs = _trajan_inputs()
    ref_model = ref.ta.TrackAutoEncoder(num_output_frames=T2D)
    our_model = TrackAutoEncoder(num_output_frames=T2D)
    ref_vars = ref_model.init(jax.random.PRNGKey(7), inputs)
    return SimpleNamespace(
        ref_model=ref_model, our_model=our_model, ref_vars=ref_vars, inputs=inputs
    )


def test_trajan2d_param_tree_identical(ref, trajan_pair):
    our_vars = trajan_pair.our_model.init(jax.random.PRNGKey(7), trajan_pair.inputs)
    # Exact same tree, shapes, AND init values (same paths + initializers) —
    # so a checkpoint trained with the reference loads verbatim
    # (reference track_autoencoder.py:137-173 module tree).
    assert_trees_allclose(trajan_pair.ref_vars, our_vars, rtol=0, atol=0)


def test_trajan2d_forward_parity_discretize(ref, trajan_pair):
    ref_out = trajan_pair.ref_model.apply(trajan_pair.ref_vars, trajan_pair.inputs)
    our_out = trajan_pair.our_model.apply(trajan_pair.ref_vars, trajan_pair.inputs)
    np.testing.assert_allclose(
        np.asarray(ref_out.tracks), np.asarray(our_out.tracks), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.visible_logits),
        np.asarray(our_out.visible_logits),
        rtol=RTOL,
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.certain_logits),
        np.asarray(our_out.certain_logits),
        rtol=RTOL,
        atol=ATOL,
    )


def test_trajan2d_default_grid_stage_parity(ref, trajan_pair):
    """encode -> context(default 32x32 grid) -> decode, stage by stage.

    ``decode`` is called with its default ``discretize=True``: the
    reference's ``@nn.remat`` traces any explicitly passed argument, so
    ``discretize=False`` is not a runnable reference path
    (track_autoencoder.py:291-299 + TracerBoolConversionError).
    """
    inputs = {k: v for k, v in trajan_pair.inputs.items() if k != "query_points"}

    def run(model):
        latents = model.apply(
            trajan_pair.ref_vars, inputs, method="encode"
        )
        ctx = model.apply(
            trajan_pair.ref_vars, inputs, method="get_decoder_context"
        )
        return latents, model.apply(
            trajan_pair.ref_vars, latents, ctx, method="decode"
        )

    ref_lat, ref_out = run(trajan_pair.ref_model)
    our_lat, our_out = run(trajan_pair.our_model)
    np.testing.assert_allclose(
        np.asarray(ref_lat), np.asarray(our_lat), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.tracks), np.asarray(our_out.tracks), rtol=RTOL, atol=ATOL
    )


def test_trajan2d_scan_chunk_parity(ref, trajan_pair):
    """The nn.scan chunked-decode path matches the reference's chunked path."""
    from tdspa.models.trajan2d import TrackAutoEncoder

    inputs = _trajan_inputs(q=8, key=2)
    ref_model = ref.ta.TrackAutoEncoder(
        num_output_frames=T2D, decoder_scan_chunk_size=4
    )
    our_model = TrackAutoEncoder(num_output_frames=T2D, decoder_scan_chunk_size=4)
    ref_out = ref_model.apply(trajan_pair.ref_vars, inputs)
    our_out = our_model.apply(trajan_pair.ref_vars, inputs)
    np.testing.assert_allclose(
        np.asarray(ref_out.tracks), np.asarray(our_out.tracks), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.visible_logits),
        np.asarray(our_out.visible_logits),
        rtol=RTOL,
        atol=ATOL,
    )


# --------------------------------------------------------------------------- #
# 3DSPA
# --------------------------------------------------------------------------- #

T3D_HEAD = 16  # num_output_frames for the test-sized predictor head


def _spa3d_inputs(batch=2, n=5, q=4, t=1, key=1, all_visible=True):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    tracks = jax.random.uniform(ks[0], (batch, n, t, 3))
    if all_visible:
        visible = jnp.ones((batch, n, t, 1), jnp.float32)
    else:
        visible = jnp.asarray(
            jax.random.bernoulli(ks[1], 0.8, (batch, n, t, 1)), jnp.float32
        )
    qpts = jnp.concatenate(
        [
            jnp.floor(jax.random.uniform(ks[2], (batch, q, 1)) * T3D_HEAD),
            jax.random.uniform(ks[3], (batch, q, 3)),
        ],
        axis=-1,
    )
    boundary = jnp.full((batch,), t)
    return {
        "support_tracks": tracks,
        "support_tracks_visible": visible,
        "query_points": qpts,
        "boundary_frame": boundary,
    }


@pytest.fixture(scope="module")
def spa3d_pair(ref):
    """Reference + tdspa 3DSPA, no dino/depth, full default dims (T=16 head).

    The reference encoder only *executes* at T=1 (its readout-mask
    construction is shape-inconsistent for T>1 — Q6,
    track_autoencoder_3d.py:167-180, pinned below), so the oracle init and
    the full-forward parity run at T=1 with all-visible tracks, where the
    buggy [*B,N,2,1] mask broadcast and the intended [readout|frame] key
    mask coincide (everything attendable).
    """
    from tdspa.models.spa3d import TrackAutoEncoder3D

    inputs = _spa3d_inputs()
    ref_model = ref.ta3.TrackAutoEncoder3D(
        num_output_frames=T3D_HEAD, use_dino=False, use_depth=False
    )
    our_model = TrackAutoEncoder3D(
        num_output_frames=T3D_HEAD, use_dino=False, use_depth=False
    )
    ref_vars = ref_model.init(jax.random.PRNGKey(9), inputs)
    return SimpleNamespace(
        ref_model=ref_model, our_model=our_model, ref_vars=ref_vars, inputs=inputs
    )


def test_spa3d_param_tree_identical_no_features(ref, spa3d_pair):
    our_vars = spa3d_pair.our_model.init(jax.random.PRNGKey(9), spa3d_pair.inputs)
    assert_trees_allclose(spa3d_pair.ref_vars, our_vars, rtol=0, atol=0)


def test_spa3d_full_forward_parity_t1(ref, spa3d_pair):
    ref_out = spa3d_pair.ref_model.apply(spa3d_pair.ref_vars, spa3d_pair.inputs)
    our_out = spa3d_pair.our_model.apply(spa3d_pair.ref_vars, spa3d_pair.inputs)
    np.testing.assert_allclose(
        np.asarray(ref_out.tracks), np.asarray(our_out.tracks), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.visible_logits),
        np.asarray(our_out.visible_logits),
        rtol=RTOL,
        atol=ATOL,
    )
    assert np.all(np.asarray(our_out.certain_logits) == 0.0)


def test_spa3d_decode_parity_given_latents(ref, spa3d_pair):
    """decode() given latents — the reference's runnable decoder sub-path
    (track_autoencoder_3d.py:248-307), exercised at Q=4 with mixed frames."""
    latents = (
        jax.random.normal(jax.random.PRNGKey(21), (2, 128, 96)) * 0.6
    )  # within/beyond the clip range on purpose
    dq = jax.random.uniform(jax.random.PRNGKey(22), (2, 4, 3))
    qframe = jnp.asarray([[0, 3, 7, 15], [1, 1, 0, 9]], jnp.int32)

    def ctx_for(model, module_ref):
        # Each side builds its own container type from the same arrays.
        ident = model.apply(
            spa3d_pair.ref_vars, dq, method="encode_point_identities"
        )
        return module_ref(
            decoder_query=ident,
            query_frame=qframe,
            boundary_frame=jnp.asarray([1, 1]),
        )

    from tdspa.models.containers import (
        TrackAutoEncoderDecoderContext as OurCtx,
    )

    ref_ctx = ctx_for(spa3d_pair.ref_model, ref.ta.TrackAutoEncoderDecoderContext)
    our_ctx = ctx_for(spa3d_pair.our_model, OurCtx)

    # Default discretize=True only: the reference's @nn.remat traces any
    # explicitly passed bool, so discretize=False is not a runnable
    # reference path (TracerBoolConversionError).
    ref_out = spa3d_pair.ref_model.apply(
        spa3d_pair.ref_vars, latents, ref_ctx, method="decode"
    )
    our_out = spa3d_pair.our_model.apply(
        spa3d_pair.ref_vars, latents, our_ctx, method="decode"
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.tracks),
        np.asarray(our_out.tracks),
        rtol=RTOL,
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(ref_out.visible_logits),
        np.asarray(our_out.visible_logits),
        rtol=RTOL,
        atol=ATOL,
    )


def test_spa3d_decoder_context_parity(ref, spa3d_pair):
    for inputs in (
        spa3d_pair.inputs,
        {k: v for k, v in spa3d_pair.inputs.items() if k != "query_points"},
    ):
        ref_ctx = spa3d_pair.ref_model.apply(
            spa3d_pair.ref_vars, inputs, method="get_decoder_context"
        )
        our_ctx = spa3d_pair.our_model.apply(
            spa3d_pair.ref_vars, inputs, method="get_decoder_context"
        )
        np.testing.assert_allclose(
            np.asarray(ref_ctx.decoder_query),
            np.asarray(our_ctx.decoder_query),
            rtol=RTOL,
            atol=ATOL,
        )
        np.testing.assert_array_equal(
            np.asarray(ref_ctx.query_frame), np.asarray(our_ctx.query_frame)
        )


def test_spa3d_append_time_feat_parity(ref, spa3d_pair):
    """The gather-based append_time_feat equals the reference's eye-matmul."""
    latents = jax.random.normal(jax.random.PRNGKey(31), (2, 4, 128, 1152))
    qframe = jnp.asarray([[0, 5, 100, 150], [3, 2, 1, 0]], jnp.int32)
    ref_out = spa3d_pair.ref_model.apply(
        spa3d_pair.ref_vars, latents, qframe, method="append_time_feat"
    )
    our_out = spa3d_pair.our_model.apply(
        spa3d_pair.ref_vars, latents, qframe, method="append_time_feat"
    )
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(our_out), rtol=1e-6, atol=1e-6
    )


# --------------------------------------------------------------------------- #
# Pinned reference defects (the two intended-behavior fixes)
# --------------------------------------------------------------------------- #


def test_reference_q6_mask_bug_pinned(ref):
    """Q6: the reference 3D encoder cannot execute for T>1.

    track_autoencoder_3d.py:177-180 concatenates a [*B,N,1,1] readout row
    onto the [*B,N,T,T] visibility mask along the row axis — the key axis
    widths (1 vs T) mismatch. tdspa implements the intended [readout|frames]
    key mask (tdspa/core/masks.py:readout_temporal_mask). If this test ever
    starts passing, the reference was fixed and the parity suite should be
    extended with a T>1 encoder diff.
    """
    model = ref.ta3.TrackAutoEncoder3D(
        num_output_frames=T3D_HEAD, use_dino=False, use_depth=False
    )
    inputs = _spa3d_inputs(t=4)
    with pytest.raises(TypeError):
        model.init(jax.random.PRNGKey(0), inputs)


def test_reference_feature_projection_bug_pinned(ref):
    """The reference's Dense(768)/Dense(256) feature projections cannot be
    residually added to the 384-wide track tokens
    (track_autoencoder_3d.py:77-79 vs :140-147) — the feature path crashes as
    written. tdspa projects to track_token_dim (the intended residual add);
    this is the one documented param-shape divergence:
    dino_projection/kernel [768, 384] (vs reference [768, 768]) and
    depth_projection/kernel [256, 384] (vs reference [256, 256]).
    """
    model = ref.ta3.TrackAutoEncoder3D(num_output_frames=T3D_HEAD)
    inputs = _spa3d_inputs(t=1)
    inputs["dino_features"] = jnp.zeros((2, 5, 1, 768))
    inputs["depth_features"] = jnp.zeros((2, 5, 1, 256))
    with pytest.raises(TypeError):
        model.init(jax.random.PRNGKey(0), inputs)

    # And the tree diff is exactly the two projection kernels (+ biases).
    from tdspa.models.spa3d import TrackAutoEncoder3D

    ref_nofeat = ref.ta3.TrackAutoEncoder3D(
        num_output_frames=T3D_HEAD, use_dino=False, use_depth=False
    ).init(jax.random.PRNGKey(0), _spa3d_inputs(t=1))
    ours_feat = TrackAutoEncoder3D(num_output_frames=T3D_HEAD).init(
        jax.random.PRNGKey(0), inputs
    )
    ref_spec = tree_spec(ref_nofeat)
    our_spec = tree_spec(ours_feat)
    extra = set(our_spec) - set(ref_spec)
    assert extra == {
        "params/dino_projection/kernel",
        "params/dino_projection/bias",
        "params/depth_projection/kernel",
        "params/depth_projection/bias",
    }
    assert set(ref_spec) - set(our_spec) == set()
    # The intended residual add: project features to track_token_dim.
    assert our_spec["params/dino_projection/kernel"][0] == (768, 384)
    assert our_spec["params/depth_projection/kernel"][0] == (256, 384)
