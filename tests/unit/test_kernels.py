"""Pallas kernels vs their XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdspa.core.attention import masked_dot_product_attention
from tdspa.kernels.attention import _xla_reference, fused_masked_attention
from tdspa.kernels.bilinear import bilinear_sample_pallas
from tdspa.ops.geometry import bilinear_sample

RNG = np.random.default_rng(0)


def test_bilinear_pallas_matches_xla():
    T, H, W, C, N = 3, 7, 9, 8, 11
    grid = RNG.normal(size=(T, H, W, C)).astype(np.float32)
    coords = np.stack(
        [RNG.uniform(-2, W + 2, (N, T)), RNG.uniform(-2, H + 2, (N, T))], -1
    ).astype(np.float32)
    ref = np.asarray(bilinear_sample(jnp.asarray(grid), jnp.asarray(coords)))
    got = np.asarray(
        bilinear_sample_pallas(jnp.asarray(grid), jnp.asarray(coords), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _attn_inputs(B=6, S=9, K=13, H=2, D=8, fully_mask_first=True):
    q = RNG.normal(size=(B, S, H, D)).astype(np.float32)
    k = RNG.normal(size=(B, K, H, D)).astype(np.float32)
    v = RNG.normal(size=(B, K, H, D)).astype(np.float32)
    mask = (RNG.uniform(size=(B, K)) > 0.3).astype(np.float32)
    if fully_mask_first:
        mask[0] = 0.0
    return map(jnp.asarray, (q, k, v, mask))


def test_fused_attention_matches_xla_masked():
    q, k, v, mask = _attn_inputs()
    ref = masked_dot_product_attention(
        q, k, v, mask=mask[:, None, None, :], compute_dtype=jnp.bfloat16
    )
    got = fused_masked_attention(q, k, v, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
    assert np.isfinite(np.asarray(got)).all()  # fully-masked row stays finite


def test_fused_attention_matches_xla_unmasked():
    q, k, v, _ = _attn_inputs()
    ref = masked_dot_product_attention(q, k, v, compute_dtype=jnp.bfloat16)
    got = fused_masked_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_fused_backward_reference_grads():
    """The custom-VJP backward re-runs _xla_reference; check that its grads
    match the plain attention implementation's grads."""
    q, k, v, mask = _attn_inputs(fully_mask_first=False)

    def loss_plain(q, k, v):
        out = masked_dot_product_attention(
            q, k, v, mask=mask[:, None, None, :], compute_dtype=jnp.bfloat16
        )
        return jnp.sum(out**2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, mask) ** 2)

    g1 = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)


def test_bilinear_pallas_dino_shapes():
    # DINO-like grid: [T, 5, 6, 16] with N=20 tracks.
    T, H, W, C, N = 2, 5, 6, 16, 20
    grid = RNG.normal(size=(T, H, W, C)).astype(np.float32)
    coords = np.stack(
        [RNG.uniform(0, W - 1, (N, T)), RNG.uniform(0, H - 1, (N, T))], -1
    ).astype(np.float32)
    ref = np.asarray(bilinear_sample(jnp.asarray(grid), jnp.asarray(coords)))
    got = np.asarray(
        bilinear_sample_pallas(jnp.asarray(grid), jnp.asarray(coords), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_flash_attention_matches_xla_multiblock():
    """KV-blocked online-softmax path: KV spans multiple blocks + padding."""
    from tdspa.kernels.attention import _flash_attention

    B, S, K, H, D = 2, 16, 1152, 2, 8  # kb=512 -> pad to 1536, 3 blocks
    q = jnp.asarray(RNG.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, K, H, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, K, H, D)).astype(np.float32))
    mask = (RNG.uniform(size=(B, K)) > 0.3).astype(np.float32)
    mask[0] = 0.0  # fully-masked item: must degrade to the mean of values
    mask = jnp.asarray(mask)

    ref = masked_dot_product_attention(
        q, k, v, mask=mask[:, None, None, :], compute_dtype=jnp.bfloat16
    )
    got = _flash_attention(q, k, v, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
    assert np.isfinite(np.asarray(got)).all()


def test_flash_attention_unmasked_with_padding():
    from tdspa.kernels.attention import _flash_attention

    B, S, K, H, D = 2, 8, 700, 2, 8  # pad 700 -> 1024: synthesized mask
    q = jnp.asarray(RNG.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, K, H, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, K, H, D)).astype(np.float32))
    ref = masked_dot_product_attention(q, k, v, compute_dtype=jnp.bfloat16)
    got = _flash_attention(q, k, v, key_mask=None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_fused_dispatch_blocked_for_large_kv():
    """fused_masked_attention routes oversized-KV shapes to the blocked path
    (the tracks_to_latents 128x2048 shape must not fall back to XLA)."""
    from tdspa.kernels.attention import fused_attention_fits

    assert fused_attention_fits(1, 128, 2048, 8, 96)
    # And the whole-KV estimate indeed exceeds the budget (so this exercises
    # the blocked branch, not the tile kernel).
    from tdspa.kernels.attention import VMEM_ELEM_BUDGET, _per_item_elems

    assert _per_item_elems(128, 2048, 8, 96) > VMEM_ELEM_BUDGET


def test_flash_perhead_matches_xla():
    """Per-head KV-blocked kernel (the ViT long-sequence path), incl. a
    padded tail block (kv_len not a multiple of the block size)."""
    from tdspa.kernels.attention import _flash_perhead

    q, k, v, _ = _attn_inputs(B=2, S=11, K=11, H=3, D=8)
    ref = masked_dot_product_attention(q, k, v, compute_dtype=jnp.bfloat16)
    got = _flash_perhead(q, k, v, kb=8, interpret=True)  # 11 -> 8 + 3-pad
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)

    got_one = _flash_perhead(q, k, v, kb=16, interpret=True)  # single block
    np.testing.assert_allclose(np.asarray(got_one), np.asarray(ref), atol=2e-2)


def test_vit_attention_fused_path_matches_einsum(monkeypatch):
    """Dinov2 _Attention with the fused path forced == the einsum path."""
    import tdspa.features.vit as vit_mod
    from tdspa.kernels import attention as ka

    cfg = vit_mod.ViTConfig(hidden_size=24, num_layers=1, num_heads=3,
                            patch_size=2, image_size=8)
    model = vit_mod.Dinov2Flax(config=cfg)
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)

    # Force the fused branch (interpret-mode kernel) regardless of backend.
    monkeypatch.setattr(
        vit_mod, "_fused_vit_attention_applicable", lambda q: True
    )
    fused = ka.fused_masked_attention
    monkeypatch.setattr(
        ka, "fused_attention",
        lambda q, k, v, key_mask: fused(q, k, v, key_mask, interpret=True),
    )
    got = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2)


def test_fused_attention_bf16_out_dtype_matches_f32():
    # out_dtype=bf16 writes the kernel result to HBM in bf16 (the consumer
    # casts to bf16 anyway); values must equal the f32 result rounded.
    from tdspa.kernels.attention import fused_masked_attention

    rng = jax.random.PRNGKey(3)
    kq, kk, kv, km = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (4, 8, 2, 16))
    k = jax.random.normal(kk, (4, 12, 2, 16))
    v = jax.random.normal(kv, (4, 12, 2, 16))
    mask = (jax.random.uniform(km, (4, 12)) > 0.3).astype(jnp.float32)
    out32 = fused_masked_attention(q, k, v, mask, interpret=True)
    out16 = fused_masked_attention(
        q, k, v, mask, interpret=True, out_dtype=jnp.bfloat16
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out32.astype(jnp.bfloat16), np.float32),
        np.asarray(out16, np.float32),
    )


def test_quant_matmul_pallas_matches_xla_int8():
    """Fused-quant kernel (interpret) vs the XLA dynamic-int8 path.

    f32 inputs: EXACT agreement — native-dtype staging means both paths
    quantize from identical values with identical f32 arithmetic (the
    round-3 advisor flagged the old unconditional bf16 cast as a silent
    dispatch-dependent numerics difference). bf16 inputs: the kernel
    upcasts to f32 before round/clip while _dynamic_int8 rounds in bf16 —
    bounded, both within int8 rounding of the f32 matmul.
    """
    from tdspa.core.quant import _dynamic_int8
    from tdspa.kernels.quant_matmul import quant_matmul

    def xla_int8(x, w):
        xq, xs = _dynamic_int8(x, axis=-1)
        wq, ws = _dynamic_int8(w, axis=0)
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * xs * ws

    rng = jax.random.PRNGKey(11)
    for m, k, n in ((96, 384, 768), (130, 768, 1280)):
        kx, kw = jax.random.split(jax.random.fold_in(rng, m))
        x = jax.random.normal(kx, (m, k)) * 3.0
        w = jax.random.normal(kw, (k, n)) * 0.05
        ref = np.asarray(xla_int8(x, w))
        got = np.asarray(quant_matmul(x, w, interpret=True))
        exact = np.asarray(x @ w)
        scale = np.abs(exact).max()
        # Same quantized values on both paths. Not bit-exact: XLA fuses the
        # dequant multiplies differently across the two programs (~1e-7
        # rel); an actual int8 rounding divergence would be ~1e-2 rel.
        np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)
        assert np.abs(got - exact).max() / scale < 0.02  # int8 rounding
        # bf16 inputs (the serving path): bounded cross-path difference.
        got16 = np.asarray(
            quant_matmul(x.astype(jnp.bfloat16), w, interpret=True)
        )
        assert np.abs(got16 - exact).max() / scale < 0.02


def test_quant_matmul_pallas_leading_dims_and_padding():
    from tdspa.kernels.quant_matmul import quant_matmul

    rng = jax.random.PRNGKey(12)
    x = jax.random.normal(rng, (3, 37, 256))  # M = 111: forces row padding
    w = jax.random.normal(jax.random.fold_in(rng, 1), (256, 512)) * 0.1
    got = np.asarray(quant_matmul(x, w, interpret=True))
    exact = np.asarray(x @ w)
    assert got.shape == (3, 37, 512)
    assert np.abs(got - exact).max() / np.abs(exact).max() < 0.02
