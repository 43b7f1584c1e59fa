"""Video depth estimation: DINOv2 encoder + DPT head in Flax, TPU-batched.

The reference shells out to the external torch VideoDepthAnything repo via
sys.path injection (inference.py:37-47, 218-284). Here the same capability is
a provider interface with a native implementation:

* ``VideoDepthAnythingFlax`` — DINOv2 encoder (``tdspa.features.vit``) + a
  DPT decode head (projection -> multi-scale reassembly -> residual fusion ->
  depth head, per the DepthAnything/DPT design the VDA checkpoints use) with
  optional temporal attention on the fused features for cross-frame
  consistency (VDA's key addition). Encoder presets and channel tables match
  the reference's VDA_MODEL_CONFIGS (inference.py:236-240).
* ``TorchVDAProvider`` — the reference's adapter, gated on the repo being
  importable.
* ``ConstantDepthProvider`` — unit depth (the reference's no-depth fallback
  lifts with z=1, inference.py:545-546).

Weight conversion from the released ``video_depth_anything_*.pth`` is
``convert_vda_params``: the checkpoint stores a torch-hub-style DINOv2
backbone under ``pretrained.*`` (fused qkv, ``ls{1,2}.gamma`` layerscale)
plus the Depth-Anything-V2 DPT head under ``head.*``; both map onto the Flax
modules here, with torch semantics (align-corners bilinear resizes, explicit
fusion target sizes, final-layernorm-applied taps) reproduced exactly —
validated against a random-init torch oracle in tests/unit/test_vda_convert.py.
VDA's AnimateDiff-style temporal motion modules
(``head.motion_modules.{i}.temporal_transformer.*``) convert too
(``_convert_motion_modules``; structure counts inferred from the
state_dict). Two documented assumptions pending the real checkpoint:
module i applies after the i-th coarsest fusion stage (their index order),
and temporal attention windows follow ``frame_chunk`` (8 frames; VDA
trains on 32-frame clips — raise ``frame_chunk`` for longer windows at
more activation memory). Unmapped keys are reported loudly, and the
``TorchVDAProvider`` adapter remains the exact-reference route.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

from absl import logging
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tdspa.features.vit import Dinov2Flax, ViTConfig

VDA_MODEL_CONFIGS = {
    "vits": {"encoder": "vits", "features": 64, "out_channels": [48, 96, 192, 384],
             "layer_idxs": [2, 5, 8, 11]},
    "vitb": {"encoder": "vitb", "features": 128, "out_channels": [96, 192, 384, 768],
             "layer_idxs": [2, 5, 8, 11]},
    "vitl": {"encoder": "vitl", "features": 256,
             "out_channels": [256, 512, 1024, 1024], "layer_idxs": [4, 11, 17, 23]},
}


def _resize_align_corners(x, out_hw):
    """Bilinear resize matching torch ``F.interpolate(align_corners=True)``.

    ``jax.image.resize`` uses half-pixel centers (align_corners=False), which
    diverges from the DPT head's resizes; trained VDA weights need the torch
    semantics. x: [B H W C] -> [B oh ow C].
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x

    def axis(in_size, out_size):
        if out_size == 1 or in_size == 1:
            pos = jnp.zeros((out_size,), jnp.float32)
        else:
            pos = jnp.arange(out_size, dtype=jnp.float32) * (
                (in_size - 1) / (out_size - 1)
            )
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.minimum(lo + 1, in_size - 1)
        return lo, hi, (pos - lo).astype(x.dtype)

    ylo, yhi, yf = axis(h, oh)
    xlo, xhi, xf = axis(w, ow)
    rows_lo = jnp.take(x, ylo, axis=1)
    rows = rows_lo + (jnp.take(x, yhi, axis=1) - rows_lo) * yf[None, :, None, None]
    cols_lo = jnp.take(rows, xlo, axis=2)
    return cols_lo + (jnp.take(rows, xhi, axis=2) - cols_lo) * xf[None, None, :, None]


class _ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return x + h


class _FusionBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, self.dtype, name="rcu1")(skip)
        x = _ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        b, h, w, c = x.shape
        x = _resize_align_corners(x, out_hw if out_hw is not None else (h * 2, w * 2))
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="project")(x)


def _sinusoidal_pe(length: int, dim: int, dtype=jnp.float32):
    """AnimateDiff PositionalEncoding buffer: interleaved sin/cos."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-np.log(10000.0) / dim)
    )
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe.astype(dtype)


class _TemporalSelfAttention(nn.Module):
    """AnimateDiff VersatileAttention (Temporal_Self): bias-free q/k/v,
    sinusoidal positional encoding on the frame axis, to_out projection."""

    channels: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):  # [S, T, C] — T is the sequence axis
        s, t, c = tokens.shape
        hd = c // self.num_heads
        x = tokens + _sinusoidal_pe(t, c, tokens.dtype)[None]
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(x)

        def heads(a):
            return a.reshape(s, t, self.num_heads, hd)

        logits = jnp.einsum(
            "sqhd,skhd->shqk", heads(q) / np.sqrt(hd), heads(k),
            preferred_element_type=jnp.float32,
        )
        probs = nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "shqk,skhd->sqhd", probs, heads(v),
            preferred_element_type=jnp.float32,
        ).reshape(s, t, c)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(
            out.astype(self.dtype)
        )


class _GEGLUFeedForward(nn.Module):
    """diffusers FeedForward(GEGLU): proj -> chunk2 -> x * gelu(gate) -> out."""

    channels: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.channels * self.mult * 2, dtype=self.dtype,
                     name="geglu_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.channels, dtype=self.dtype, name="out")(h)


class _TemporalTransformerBlock(nn.Module):
    channels: int
    num_attention_blocks: int = 2
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):  # [S, T, C]
        for a in range(self.num_attention_blocks):
            normed = nn.LayerNorm(dtype=jnp.float32, name=f"norm_{a}")(tokens)
            tokens = tokens + _TemporalSelfAttention(
                self.channels, self.num_heads, dtype=self.dtype,
                name=f"attention_{a}",
            )(normed.astype(tokens.dtype))
        normed = nn.LayerNorm(dtype=jnp.float32, name="ff_norm")(tokens)
        return tokens + _GEGLUFeedForward(
            self.channels, dtype=self.dtype, name="ff"
        )(normed.astype(tokens.dtype))


class _MotionModule(nn.Module):
    """AnimateDiff-style TemporalTransformer3DModel as VDA uses it:
    GroupNorm(32) -> proj_in -> temporal transformer blocks over the frame
    axis at each spatial location -> proj_out -> + residual."""

    channels: int
    num_transformer_blocks: int = 1
    num_attention_blocks: int = 2
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [T H W C]
        t, h, w, c = x.shape
        residual = x
        normed = nn.GroupNorm(
            num_groups=min(32, c), epsilon=1e-5, dtype=jnp.float32, name="norm"
        )(x)
        tokens = normed.astype(x.dtype).reshape(t, h * w, c)
        tokens = nn.Dense(c, dtype=self.dtype, name="proj_in")(tokens)
        # Temporal sequences: one per spatial location.
        tokens = jnp.transpose(tokens, (1, 0, 2))  # [H*W, T, C]
        for b in range(self.num_transformer_blocks):
            tokens = _TemporalTransformerBlock(
                c, self.num_attention_blocks, self.num_heads,
                dtype=self.dtype, name=f"block_{b}",
            )(tokens)
        tokens = jnp.transpose(tokens, (1, 0, 2))  # [T, H*W, C]
        tokens = nn.Dense(c, dtype=self.dtype, name="proj_out")(tokens)
        return residual + tokens.reshape(t, h, w, c)


class _TemporalAttention(nn.Module):
    """Self-attention over the frame axis at each spatial location."""

    features: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [T H W C] — T is the sequence axis
        t, h, w, c = x.shape
        tokens = x.transpose(1, 2, 0, 3).reshape(h * w, t, c)
        normed = nn.LayerNorm(dtype=jnp.float32, name="norm")(tokens)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(normed, normed)
        tokens = tokens + attn
        return tokens.reshape(h, w, t, c).transpose(2, 0, 1, 3)


class DPTHead(nn.Module):
    """DPT decode head: 4 tapped ViT feature maps -> dense depth.

    Temporal options: ``use_temporal`` is the from-scratch single-stage
    temporal attention; ``use_motion_modules`` inserts the four
    AnimateDiff-style modules VDA's checkpoints carry
    (``head.motion_modules.{0..3}``) — ASSUMED to pair coarse-to-fine with
    the fusion outputs (module 0 after the coarsest refinenet), matching
    their index order; converted weights flow via ``convert_vda_params``.
    """

    features: int
    out_channels: Sequence[int]
    use_temporal: bool = True
    use_motion_modules: bool = False
    motion_transformer_blocks: int = 1
    motion_attention_blocks: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps, patch_hw, out_hw):
        """taps: 4x [T, Hp*Wp, D] token maps (CLS removed); returns [T H W 1]."""
        hp, wp = patch_hw
        resized = []
        for i, tokens in enumerate(taps):
            t, _, d = tokens.shape
            x = tokens.reshape(t, hp, wp, d)
            x = nn.Conv(
                self.out_channels[i], (1, 1), dtype=self.dtype, name=f"project_{i}"
            )(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[i], (4, 4), strides=(4, 4),
                    dtype=self.dtype, name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[i], (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="resize_1",
                )(x)
            elif i == 3:
                x = nn.Conv(
                    self.out_channels[i], (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="resize_3",
                )(x)
            x = nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"scratch_{i}",
            )(x)
            resized.append(x)

        def motion(idx, x):
            if not self.use_motion_modules:
                return x
            return _MotionModule(
                self.features,
                num_transformer_blocks=self.motion_transformer_blocks,
                num_attention_blocks=self.motion_attention_blocks,
                dtype=self.dtype,
                name=f"motion_module_{idx}",
            )(x)

        path = _FusionBlock(self.features, self.dtype, name="fusion_3")(
            resized[3], out_hw=resized[2].shape[1:3]
        )
        if self.use_temporal:
            path = _TemporalAttention(self.features, dtype=self.dtype,
                                      name="temporal_3")(path)
        path = motion(0, path)
        path = _FusionBlock(self.features, self.dtype, name="fusion_2")(
            path, resized[2], out_hw=resized[1].shape[1:3]
        )
        path = motion(1, path)
        path = _FusionBlock(self.features, self.dtype, name="fusion_1")(
            path, resized[1], out_hw=resized[0].shape[1:3]
        )
        path = motion(2, path)
        path = _FusionBlock(self.features, self.dtype, name="fusion_0")(
            path, resized[0]
        )
        path = motion(3, path)

        h = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="head_conv1")(path)
        h = _resize_align_corners(h, out_hw)
        h = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(h)
        return nn.relu(h)  # relative depth >= 0


class VideoDepthEstimator:
    """Callable wrapper: owns params, taps intermediates, chunks frames."""

    def __init__(
        self,
        encoder: str = "vitb",
        params=None,
        use_temporal: bool = True,
        use_motion_modules: bool = False,
        motion_structure: dict | None = None,
        dtype=jnp.bfloat16,
        frame_chunk: int = 8,
        vit_config: ViTConfig | None = None,
        head_cfg: dict | None = None,
        residual_dtype=jnp.float32,
        output_scale: float = 1.0,
        input_size: int = 518,
        gelu_approximate: bool = False,
    ):
        cfg = dict(VDA_MODEL_CONFIGS[encoder])
        if head_cfg:
            cfg.update(head_cfg)
        self.cfg = cfg
        self.vit_config = vit_config or ViTConfig.preset(encoder)
        # residual_dtype=bf16: backbone residual stream in bf16 (same knob
        # as the model stacks; taps are final-layernormed back to f32).
        # gelu_approximate: tanh GELU in the backbone blocks (serving
        # knob — see tdspa/features/vit.py::_Block).
        self.backbone = Dinov2Flax(
            config=self.vit_config, dtype=dtype, residual_dtype=residual_dtype,
            gelu_approximate=gelu_approximate,
        )
        motion_structure = motion_structure or {}
        self.head = DPTHead(
            features=cfg["features"],
            out_channels=cfg["out_channels"],
            use_temporal=use_temporal,
            use_motion_modules=use_motion_modules,
            motion_transformer_blocks=motion_structure.get(
                "transformer_blocks", 1
            ),
            motion_attention_blocks=motion_structure.get(
                "attention_blocks", 2
            ),
            dtype=dtype,
        )
        self.layer_idxs = tuple(cfg["layer_idxs"])
        self.frame_chunk = frame_chunk
        # output_scale < 1: run the DPT head's full-resolution tail (the
        # align-corners upsample + head_conv2/3) at a reduced resolution and
        # bilinearly upsample the 1-channel depth instead. The tail is
        # HBM-bound (518^2 x 32ch activations per frame dwarf its FLOPs);
        # measured 0.22 s of the 1.07 s stage at scale 0.5 (-21% stage,
        # -6% e2e, docs/BENCHMARKS.md round 4). APPROXIMATION: head_conv2/3
        # are nonlinear, so this is not numerics-equivalent to the
        # reference head (inference serving knob; default 1.0 = exact).
        if not (0.0 < output_scale <= 1.0):
            raise ValueError(f"output_scale must be in (0, 1], got {output_scale}")
        self.output_scale = float(output_scale)
        # input_size < 518: resize frames so the LONG side ~ input_size
        # before the backbone (default for __call__; an explicit call arg
        # still overrides). The backbone is the depth stage's dominant term
        # and scales ~quadratically with side length; position embeddings
        # interpolate (tdspa/features/vit.py). APPROXIMATION vs the
        # reference's fixed 518 input (serving knob; default 518 = exact).
        if input_size < self.vit_config.patch_size:
            raise ValueError(
                f"input_size must be >= patch size "
                f"({self.vit_config.patch_size}), got {input_size}"
            )
        self.input_size = int(input_size)
        self.params = params

    @classmethod
    def from_checkpoint(cls, path: str, encoder: str = "vitb", **kwargs):
        """Load a released ``video_depth_anything_*.pth`` natively.

        AnimateDiff-style temporal motion modules are converted when present
        (structure inferred from the state_dict); the from-scratch
        ``temporal_3`` stage stays off for converted checkpoints.
        """
        import torch

        state_dict = torch.load(path, map_location="cpu", weights_only=True)
        structure = motion_module_structure(state_dict.keys())
        est = cls(
            encoder=encoder,
            use_temporal=False,
            use_motion_modules=structure is not None,
            motion_structure=structure,
            **kwargs,
        )
        est.params = convert_vda_params(
            state_dict, encoder=encoder,
            vit_config=kwargs.get("vit_config"),
            head_cfg=kwargs.get("head_cfg"),
        )
        return est

    def init_params(self, rng, sample_hw=(126, 126)):
        h, w = sample_hw
        frames = jnp.zeros((2, h, w, 3))
        bb = self.backbone.init(rng, frames)["params"]
        taps = self._taps(bb, frames)
        p = self.vit_config.patch_size
        head = self.head.init(rng, taps, (h // p, w // p), (h, w))["params"]
        self.params = {"backbone": bb, "head": head}
        return self.params

    def _taps(self, backbone_params, frames):
        """Tapped-layer token maps, final-layernormed, CLS dropped.

        DINOv2's ``get_intermediate_layers`` (which Depth-Anything/VDA use)
        applies the backbone's final LayerNorm to every tap (norm=True
        default) — reproduced here with the same params/eps.
        """
        _, state = self.backbone.apply(
            {"params": backbone_params},
            frames,
            capture_intermediates=lambda mdl, method: (
                method == "__call__" and mdl.name is not None
                and mdl.name.startswith("layer_")
            ),
            mutable=["intermediates"],
        )
        inter = state["intermediates"]
        ln = backbone_params["layernorm"]
        eps = self.vit_config.layer_norm_eps
        taps = []
        for idx in self.layer_idxs:
            tokens = inter[f"layer_{idx}"]["__call__"][0].astype(jnp.float32)
            mu = tokens.mean(-1, keepdims=True)
            var = jnp.square(tokens - mu).mean(-1, keepdims=True)
            tokens = (tokens - mu) * jax.lax.rsqrt(var + eps)
            tokens = tokens * ln["scale"] + ln["bias"]
            taps.append(tokens[:, 1:])  # drop CLS
        return taps

    def __call__(self, video, input_size: int | None = None) -> jnp.ndarray:
        """video [T H W 3] uint8 -> depth [T H W 1] f32 (device-resident)."""
        if input_size is None:
            input_size = self.input_size
        if self.params is None:
            logging.warning(
                "VideoDepthEstimator has no weights; depth will use RANDOM "
                "weights (shape-correct, not meaningful)"
            )
            self.init_params(jax.random.PRNGKey(0))
        from tdspa.features.dino import IMAGENET_MEAN, IMAGENET_STD

        t, h, w = video.shape[:3]
        p = self.vit_config.patch_size
        # Resize so the long side ~ input_size, snapped to patch multiples.
        scale = input_size / max(h, w)
        th = max(int(round(h * scale / p)) * p, p)
        tw = max(int(round(w * scale / p)) * p, p)
        x = jnp.asarray(video, jnp.float32) / 255.0
        x = jax.image.resize(x, (t, th, tw, 3), method="bilinear")
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return self._forward(self.params, x, (h, w))

    @property
    def _forward(self):
        if not hasattr(self, "_forward_fn"):
            p = self.vit_config.patch_size
            chunk = self.frame_chunk

            @functools.partial(jax.jit, static_argnames=("out_hw",))
            def fwd(params, frames, out_hw):
                # ONE dispatch: frame chunks via lax.map (bounds activation
                # memory), depth resized back to the source resolution on
                # device.
                t = frames.shape[0]
                pad = (-t) % chunk
                if pad:
                    # Edge-replicate (not zero-pad): padded frames take part
                    # in temporal attention, and zeros would perturb the real
                    # frames' outputs in the final group.
                    frames = jnp.concatenate(
                        [frames,
                         jnp.repeat(frames[-1:], pad, axis=0)]
                    )
                groups = frames.reshape((-1, chunk) + frames.shape[1:])

                def one(g):
                    taps = self._taps(params["backbone"], g)
                    _, gh, gw, _ = g.shape
                    s = self.output_scale
                    head_hw = (max(int(round(gh * s)), 1),
                               max(int(round(gw * s)), 1))
                    return self.head.apply(
                        {"params": params["head"]}, taps,
                        (gh // p, gw // p), head_hw,
                    )

                d = jax.lax.map(one, groups)
                d = d.reshape((-1,) + d.shape[2:])[:t]
                return jax.image.resize(
                    d, (t, out_hw[0], out_hw[1], 1), method="bilinear"
                )

            self._forward_fn = fwd
        return self._forward_fn


class ConstantDepthProvider:
    """Unit depth everywhere (reference z=1 fallback, inference.py:545-546)."""

    def __call__(self, video: np.ndarray, fps: float = 30.0) -> np.ndarray:
        t, h, w = video.shape[:3]
        return np.ones((t, h, w, 1), np.float32)


class TorchVDAProvider:
    """The reference's external-repo adapter (inference.py:218-284)."""

    def __init__(self, encoder: str = "vitb", model_path: str | None = None):
        self.encoder = encoder
        self.model_path = model_path

    def __call__(self, video, fps: float = 30.0) -> np.ndarray:
        import os
        import sys

        video = np.asarray(video)  # torch/cv2 cannot consume jax arrays

        for path in ("Video-Depth-Anything", "../Video-Depth-Anything",
                     "./Video-Depth-Anything"):
            if os.path.exists(path) and path not in sys.path:
                sys.path.insert(0, path)
        try:
            import torch
            from video_depth_anything.video_depth import VideoDepthAnything
        except ImportError as e:
            raise RuntimeError(
                "VideoDepthAnything not available; clone "
                "github.com/DepthAnything/Video-Depth-Anything or use "
                "VideoDepthEstimator/ConstantDepthProvider"
            ) from e

        cfg = {k: v for k, v in VDA_MODEL_CONFIGS[self.encoder].items()
               if k in ("encoder", "features", "out_channels")}
        model = VideoDepthAnything(**cfg, metric=False)
        model.load_state_dict(
            torch.load(self.model_path, map_location="cpu"), strict=True
        )
        device = "cuda" if torch.cuda.is_available() else "cpu"
        model = model.to(device).eval()
        depths, _ = model.infer_video_depth(
            video.astype(np.float32) / 255.0, fps, input_size=518,
            device=device, fp32=False,
        )
        return depths[..., np.newaxis].astype(np.float32)


def convert_vda_params(state_dict, encoder: str = "vitb",
                       vit_config: ViTConfig | None = None,
                       head_cfg: dict | None = None) -> dict:
    """``video_depth_anything_*.pth`` torch state_dict -> Flax params.

    Maps the torch-hub DINOv2 backbone (``pretrained.*``: fused qkv,
    ``ls{1,2}.gamma`` layerscale) onto ``Dinov2Flax`` and the
    Depth-Anything-V2 DPT head (``head.*``) onto ``DPTHead``. Returns
    ``{"backbone": ..., "head": ...}`` for ``VideoDepthEstimator``.
    Temporal ``head.motion_modules.{i}.temporal_transformer.*`` convert via
    ``_convert_motion_modules`` (structure counts inferred from the state
    dict). Unconverted keys (``mask_token``, the parameter-only
    ``refinenet4.resConfUnit1``) are logged and dropped.
    """
    import numpy as np

    cfg = dict(VDA_MODEL_CONFIGS[encoder])
    if head_cfg:
        cfg.update(head_cfg)
    vit = vit_config or ViTConfig.preset(encoder)

    sd = {
        k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
        else np.asarray(v)
        for k, v in state_dict.items()
    }
    used = set()

    def t(name):
        used.add(name)
        return sd[name]

    def norm(name):
        return {"scale": t(f"{name}.weight"), "bias": t(f"{name}.bias")}

    def dense(name):
        return {"kernel": t(f"{name}.weight").T, "bias": t(f"{name}.bias")}

    def conv(name):
        # torch conv [out,in,kh,kw] -> flax [kh,kw,in,out]
        return {"kernel": t(f"{name}.weight").transpose(2, 3, 1, 0),
                "bias": t(f"{name}.bias")}

    def conv_nobias(name):
        return {"kernel": t(f"{name}.weight").transpose(2, 3, 1, 0)}

    def deconv(name):
        # torch ConvTranspose2d [in,out,kh,kw]; flax nn.ConvTranspose
        # (transpose_kernel=False) correlates with the kernel, so the torch
        # weights must be spatially flipped: out[si+c] += x[i]*W[...,c] in
        # torch vs x[i]*K[k-1-c,...] in flax.
        w = t(f"{name}.weight").transpose(2, 3, 0, 1)[::-1, ::-1]
        return {"kernel": np.ascontiguousarray(w), "bias": t(f"{name}.bias")}

    d, h = vit.hidden_size, vit.num_heads
    hd = d // h
    backbone: dict = {
        "cls_token": t("pretrained.cls_token"),
        "pos_embed": t("pretrained.pos_embed"),
        "patch_embed": {
            "kernel": t("pretrained.patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": t("pretrained.patch_embed.proj.bias"),
        },
        "layernorm": norm("pretrained.norm"),
    }
    for i in range(vit.num_layers):
        pre = f"pretrained.blocks.{i}"
        qkv_w = t(f"{pre}.attn.qkv.weight")  # [3d, d] rows = [q; k; v]
        qkv_b = t(f"{pre}.attn.qkv.bias")

        def split(j):
            return {
                "kernel": qkv_w[j * d:(j + 1) * d].T.reshape(d, h, hd),
                "bias": qkv_b[j * d:(j + 1) * d].reshape(h, hd),
            }

        backbone[f"layer_{i}"] = {
            "norm1": norm(f"{pre}.norm1"),
            "norm2": norm(f"{pre}.norm2"),
            "attention": {
                "query": split(0),
                "key": split(1),
                "value": split(2),
                "output": {
                    "kernel": t(f"{pre}.attn.proj.weight").T.reshape(h, hd, d),
                    "bias": t(f"{pre}.attn.proj.bias"),
                },
            },
            "layer_scale1": t(f"{pre}.ls1.gamma"),
            "layer_scale2": t(f"{pre}.ls2.gamma"),
            "fc1": dense(f"{pre}.mlp.fc1"),
            "fc2": dense(f"{pre}.mlp.fc2"),
        }

    def rcu(name):
        return {"conv1": conv(f"{name}.conv1"), "conv2": conv(f"{name}.conv2")}

    head: dict = {}
    for i in range(4):
        head[f"project_{i}"] = conv(f"head.projects.{i}")
        head[f"scratch_{i}"] = conv_nobias(f"head.scratch.layer{i + 1}_rn")
    head["resize_0"] = deconv("head.resize_layers.0")
    head["resize_1"] = deconv("head.resize_layers.1")
    head["resize_3"] = conv("head.resize_layers.3")
    # refinenet4..1 fuse top-down; refinenet4 takes no skip, so its
    # resConfUnit1 params exist in the checkpoint but are dead — consume them.
    for flax_name, torch_name, has_skip in [
        ("fusion_3", "refinenet4", False),
        ("fusion_2", "refinenet3", True),
        ("fusion_1", "refinenet2", True),
        ("fusion_0", "refinenet1", True),
    ]:
        pre = f"head.scratch.{torch_name}"
        block = {"rcu2": rcu(f"{pre}.resConfUnit2"),
                 "project": conv(f"{pre}.out_conv")}
        dead_or_live = rcu(f"{pre}.resConfUnit1")
        if has_skip:
            block["rcu1"] = dead_or_live
        head[flax_name] = block
    head["head_conv1"] = conv("head.scratch.output_conv1")
    head["head_conv2"] = conv("head.scratch.output_conv2.0")
    head["head_conv3"] = conv("head.scratch.output_conv2.2")

    _convert_motion_modules(sd, used, head, t, norm, dense)

    unmapped = sorted(set(sd) - used)
    if unmapped:
        logging.warning(
            "convert_vda_params: %d keys not converted: %s",
            len(unmapped), unmapped[:10],
        )
    return {"backbone": backbone, "head": head}


def motion_module_structure(keys) -> dict | None:
    """Infer VDA motion-module counts from state_dict keys; None if absent.

    Returns {'modules': M, 'transformer_blocks': B, 'attention_blocks': A}.
    """
    import re

    mods, blocks, attns = set(), set(), set()
    for k in keys:
        m = re.match(
            r"head\.motion_modules\.(\d+)\.temporal_transformer\."
            r"(?:transformer_blocks\.(\d+)\.(?:attention_blocks\.(\d+)\.)?)?",
            k,
        )
        if m:
            mods.add(int(m.group(1)))
            if m.group(2) is not None:
                blocks.add(int(m.group(2)))
            if m.group(3) is not None:
                attns.add(int(m.group(3)))
    if not mods:
        return None
    return {
        "modules": max(mods) + 1,
        "transformer_blocks": max(blocks) + 1 if blocks else 1,
        "attention_blocks": max(attns) + 1 if attns else 1,
    }


def _convert_motion_modules(sd, used, head, t, norm, dense):
    """head.motion_modules.{i}.temporal_transformer.* -> motion_module_{i}.

    AnimateDiff TemporalTransformer3DModel layout: norm (GroupNorm),
    proj_in/out, transformer_blocks.{b} with attention_blocks.{a}
    (to_q/to_k/to_v bias-free, to_out.0, pos_encoder.pe buffer — recomputed,
    consumed), norms.{a}, ff (GEGLU net.0.proj + net.2), ff_norm.
    """
    structure = motion_module_structure(sd)
    if structure is None:
        return

    def dense_nobias(name):
        return {"kernel": t(f"{name}.weight").T}

    for i in range(structure["modules"]):
        pre = f"head.motion_modules.{i}.temporal_transformer"
        module: dict = {
            "norm": norm(f"{pre}.norm"),
            "proj_in": dense(f"{pre}.proj_in"),
            "proj_out": dense(f"{pre}.proj_out"),
        }
        for b in range(structure["transformer_blocks"]):
            bpre = f"{pre}.transformer_blocks.{b}"
            block: dict = {
                "ff_norm": norm(f"{bpre}.ff_norm"),
                "ff": {
                    "geglu_proj": dense(f"{bpre}.ff.net.0.proj"),
                    "out": dense(f"{bpre}.ff.net.2"),
                },
            }
            for a in range(structure["attention_blocks"]):
                apre = f"{bpre}.attention_blocks.{a}"
                block[f"norm_{a}"] = norm(f"{bpre}.norms.{a}")
                block[f"attention_{a}"] = {
                    "to_q": dense_nobias(f"{apre}.to_q"),
                    "to_k": dense_nobias(f"{apre}.to_k"),
                    "to_v": dense_nobias(f"{apre}.to_v"),
                    "to_out": dense(f"{apre}.to_out.0"),
                }
                pe_key = f"{apre}.pos_encoder.pe"
                if pe_key in sd:
                    used.add(pe_key)  # deterministic buffer; recomputed
            module[f"block_{b}"] = block
        head[f"motion_module_{i}"] = module


def extract_depth_features(
    video: np.ndarray, provider=None, fps: float = 30.0, encoder: str = "vitb"
) -> np.ndarray:
    """Reference-compatible entry (inference.py:218) -> host [T H W 1].

    Returns a host numpy array like the reference; the pipeline uses the
    provider objects directly to keep results device-resident."""
    if provider is None:
        provider = VideoDepthEstimator(encoder=encoder)
    out = provider(video) if not _wants_fps(provider) else provider(video, fps=fps)
    return np.asarray(out, np.float32)


def _wants_fps(provider) -> bool:
    import inspect

    try:
        return "fps" in inspect.signature(provider.__call__).parameters
    except (TypeError, ValueError):
        return False
