"""DINOv2-compatible Vision Transformer in Flax, batched for TPU.

The reference extracts DINOv2 features with a *per-frame Python loop* over HF
torch on GPU (inference.py:200-213 — one forward per frame). Here the full
video runs as ONE batched XLA forward over all T frames; weights convert from
the HF ``facebook/dinov2-*`` checkpoints via ``convert_hf_dinov2_params``.

Math mirrors ``transformers.models.dinov2.modeling_dinov2`` exactly
(pre-LN blocks with LayerScale, qkv-bias attention, exact-erf GELU MLP,
bicubic position-embedding interpolation, final LayerNorm), verified against
the torch implementation in tests/unit/test_vit.py. One known tolerance:
torch's bicubic uses the a=-0.75 Keys kernel while jax.image.resize uses
a=-0.5, so interpolated position embeddings (input size != native 224)
differ at ~1e-3 relative — irrelevant at feature scale.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ViTConfig:
    """Shapes for dinov2-small/base/large/giant."""

    PRESETS = {
        "vits": dict(hidden_size=384, num_layers=12, num_heads=6),
        "vitb": dict(hidden_size=768, num_layers=12, num_heads=12),
        "vitl": dict(hidden_size=1024, num_layers=24, num_heads=16),
        "vitg": dict(hidden_size=1536, num_layers=40, num_heads=24),
    }

    def __init__(
        self,
        hidden_size: int = 768,
        num_layers: int = 12,
        num_heads: int = 12,
        mlp_ratio: int = 4,
        patch_size: int = 14,
        image_size: int = 518,
        layer_norm_eps: float = 1e-6,
        layerscale_value: float = 1.0,
    ):
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.mlp_ratio = mlp_ratio
        self.patch_size = patch_size
        self.image_size = image_size
        self.layer_norm_eps = layer_norm_eps
        self.layerscale_value = layerscale_value

    @classmethod
    def preset(cls, name: str, **kwargs) -> "ViTConfig":
        return cls(**{**cls.PRESETS[name], **kwargs})


def _fused_vit_attention_applicable(q) -> bool:
    """Pallas fused path: TPU backend + a serviceable (maskless) shape."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from tdspa.kernels.attention import fused_attention_fits

    b, s, h, d = q.shape
    return fused_attention_fits(b, s, s, h, d, maskless=True)


class _Attention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32
    use_fused: bool = True
    # bf16 kernel output (engaged by the bf16 residual stream): the output
    # projection casts to the compute dtype anyway, so a bf16 HBM write
    # halves this intermediate's traffic at zero extra rounding.
    kernel_out_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        head_dim = self.hidden_size // self.num_heads
        q = nn.DenseGeneral(
            (self.num_heads, head_dim), dtype=self.dtype, name="query"
        )(x)
        k = nn.DenseGeneral(
            (self.num_heads, head_dim), dtype=self.dtype, name="key"
        )(x)
        v = nn.DenseGeneral(
            (self.num_heads, head_dim), dtype=self.dtype, name="value"
        )(x)
        if self.use_fused and _fused_vit_attention_applicable(q):
            # VMEM-resident attention (per-head KV-blocked online softmax at
            # ViT sequence lengths): XLA otherwise materializes the
            # [B, H, S, S] logits in HBM — ~1.3 GB per layer per 16-frame
            # chunk at 1297 tokens — making feature extraction
            # bandwidth-bound. Differentiable via the XLA-recompute vjp.
            # (1/sqrt(head_dim) scaling is applied inside the kernel.)
            if self.kernel_out_dtype == jnp.float32:
                # Differentiable wrapper (XLA-recompute backward).
                from tdspa.kernels.attention import fused_attention

                out = fused_attention(q, k, v, None)
            else:
                from tdspa.kernels.attention import fused_masked_attention

                out = fused_masked_attention(
                    q, k, v, None, out_dtype=self.kernel_out_dtype
                )
            return nn.DenseGeneral(
                self.hidden_size, axis=(-2, -1), dtype=self.dtype, name="output"
            )(out.astype(self.dtype))
        logits = jnp.einsum(
            "...qhd,...khd->...hqk",
            q.astype(self.dtype) / jnp.sqrt(head_dim).astype(self.dtype),
            k.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        probs = nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "...hqk,...khd->...qhd",
            probs.astype(self.dtype),
            v.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return nn.DenseGeneral(
            self.hidden_size, axis=(-2, -1), dtype=self.dtype, name="output"
        )(out)


class _Block(nn.Module):
    config: Any
    dtype: Any = jnp.float32
    # Residual-stream dtype (f32 default; bf16 halves the stack's
    # elementwise/HBM traffic — same knob as tdspa/core/attention.py,
    # measured there at +22% on the decode stack; norm statistics stay
    # f32 via flax's internal upcast).
    residual_dtype: Any = jnp.float32
    # tanh-GELU instead of HF's exact-erf GELU. The erf is VPU-bound at
    # these shapes: measured -17.5% on the 150-frame ViT-B DINO stage
    # (0.622 -> 0.513 s, docs/BENCHMARKS.md round 4). ~1e-3 relative
    # activation delta (serving knob; default False = exact HF numerics).
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.residual_dtype, name="norm1"
        )(x)
        h = _Attention(
            c.hidden_size, c.num_heads, dtype=self.dtype,
            kernel_out_dtype=self.residual_dtype, name="attention"
        )(h)
        # Cast the f32 layer-scale params down rather than letting them
        # promote the whole residual back to f32.
        h = h * self.param(
            "layer_scale1",
            nn.initializers.constant(c.layerscale_value),
            (c.hidden_size,),
        ).astype(self.residual_dtype)
        x = x.astype(self.residual_dtype) + h
        h = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.residual_dtype, name="norm2"
        )(x)
        h = nn.Dense(c.hidden_size * c.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        # HF uses exact-erf GELU; approximate=True is the serving knob.
        h = nn.gelu(h, approximate=self.gelu_approximate)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        h = h * self.param(
            "layer_scale2",
            nn.initializers.constant(c.layerscale_value),
            (c.hidden_size,),
        ).astype(self.residual_dtype)
        return x + h.astype(self.residual_dtype)


def interpolate_pos_embed(pos_embed, new_height, new_width):
    """Bicubic-resize the patch position grid; CLS slot passes through.

    pos_embed: [1, 1+S*S, D] -> [1, 1+new_h*new_w, D].
    """
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    num_positions = patch_pos.shape[1]
    side = int(round(num_positions ** 0.5))
    dim = patch_pos.shape[-1]
    if (new_height, new_width) == (side, side):
        return pos_embed
    grid = patch_pos.reshape(1, side, side, dim)
    grid = jax.image.resize(
        grid.astype(jnp.float32), (1, new_height, new_width, dim), method="bicubic"
    )
    return jnp.concatenate(
        [cls_pos, grid.reshape(1, new_height * new_width, dim)], axis=1
    )


class Dinov2Flax(nn.Module):
    """DINOv2 encoder; input [B H W 3] (channel-last), output tokens.

    ``__call__`` returns last_hidden_state [B, 1+hw, D] (CLS first), matching
    HF ``Dinov2Model`` without pooling.
    """

    config: Any
    dtype: Any = jnp.float32
    residual_dtype: Any = jnp.float32  # see _Block.residual_dtype
    gelu_approximate: bool = False  # see _Block.gelu_approximate

    @nn.compact
    def __call__(self, pixel_values):
        c = self.config
        batch, height, width, _ = pixel_values.shape
        p = c.patch_size
        x = nn.Conv(
            c.hidden_size,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(pixel_values)
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(batch, hp * wp, c.hidden_size)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, c.hidden_size)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (batch, 1, c.hidden_size)), x], axis=1
        )
        native_side = c.image_size // p
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(1.0),
            (1, native_side * native_side + 1, c.hidden_size),
        )
        x = x + interpolate_pos_embed(pos_embed, hp, wp)

        for i in range(c.num_layers):
            x = _Block(
                config=c, dtype=self.dtype,
                residual_dtype=self.residual_dtype,
                gelu_approximate=self.gelu_approximate, name=f"layer_{i}",
            )(x)
        # Final norm emits f32 regardless of the residual dtype: the token
        # features feed projections / the DPT head at a stable interface.
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layernorm"
        )(x)

    def patch_grid(self, pixel_values):
        """[B H W 3] -> [B Hp Wp D] patch features (CLS dropped)."""
        tokens = self(pixel_values)
        batch, height, width, _ = pixel_values.shape
        hp, wp = height // self.config.patch_size, width // self.config.patch_size
        return tokens[:, 1:].reshape(batch, hp, wp, self.config.hidden_size)


def convert_hf_dinov2_params(state_dict, config: ViTConfig) -> dict:
    """HF ``Dinov2Model`` torch state_dict -> ``Dinov2Flax`` params."""
    import numpy as np

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    d, h = config.hidden_size, config.num_heads
    hd = d // h
    params: dict = {
        "cls_token": t("embeddings.cls_token"),
        "pos_embed": t("embeddings.position_embeddings"),
        "patch_embed": {
            # torch conv [out,in,kh,kw] -> flax [kh,kw,in,out]
            "kernel": t("embeddings.patch_embeddings.projection.weight").transpose(
                2, 3, 1, 0
            ),
            "bias": t("embeddings.patch_embeddings.projection.bias"),
        },
        "layernorm": {"scale": t("layernorm.weight"), "bias": t("layernorm.bias")},
    }
    for i in range(config.num_layers):
        pre = f"encoder.layer.{i}"
        attn = f"{pre}.attention.attention"

        def qkv(name):
            w = t(f"{attn}.{name}.weight")  # [d, d] torch (out, in)
            b = t(f"{attn}.{name}.bias")
            return {"kernel": w.T.reshape(d, h, hd), "bias": b.reshape(h, hd)}

        out_w = t(f"{pre}.attention.output.dense.weight")  # [d, d]
        params[f"layer_{i}"] = {
            "norm1": {"scale": t(f"{pre}.norm1.weight"), "bias": t(f"{pre}.norm1.bias")},
            "norm2": {"scale": t(f"{pre}.norm2.weight"), "bias": t(f"{pre}.norm2.bias")},
            "attention": {
                "query": qkv("query"),
                "key": qkv("key"),
                "value": qkv("value"),
                "output": {
                    "kernel": out_w.T.reshape(h, hd, d),
                    "bias": t(f"{pre}.attention.output.dense.bias"),
                },
            },
            "layer_scale1": t(f"{pre}.layer_scale1.lambda1"),
            "layer_scale2": t(f"{pre}.layer_scale2.lambda1"),
            "fc1": {
                "kernel": t(f"{pre}.mlp.fc1.weight").T,
                "bias": t(f"{pre}.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": t(f"{pre}.mlp.fc2.weight").T,
                "bias": t(f"{pre}.mlp.fc2.bias"),
            },
        }
    return params
