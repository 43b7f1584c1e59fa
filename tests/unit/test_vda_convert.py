"""VDA .pth -> Flax conversion: numerical parity against a torch oracle.

The released ``video_depth_anything_*.pth`` checkpoints are not available in
this environment, so the oracle is a tiny random-init torch module that
replicates their exact structure and state_dict key layout: a torch-hub-style
DINOv2 backbone under ``pretrained.*`` (fused qkv, ls1/ls2 layerscale) and
the Depth-Anything-V2 DPT head under ``head.*`` (projects / resize_layers /
scratch.layer{i}_rn / refinenet{1..4} / output_conv{1,2}), with DA-V2's
forward semantics (norm=True taps, align_corners=True resizes, explicit
fusion sizes). ``convert_vda_params`` must map it so the Flax estimator
reproduces the torch depth map.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tdspa.features.depth import (  # noqa: E402
    VideoDepthEstimator,
    convert_vda_params,
)
from tdspa.features.vit import ViTConfig  # noqa: E402

# Tiny configuration: 4 ViT layers all tapped, 28x28 input -> 2x2 patches.
HIDDEN, HEADS, LAYERS, PATCH, IMG = 32, 2, 4, 14, 28
FEATURES, OUT_CHANNELS, LAYER_IDXS = 16, (8, 16, 24, 32), (0, 1, 2, 3)


class _HubBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.randn(d) * 0.1)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.randn(d) * 0.1)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.attn.qkv(self.norm1(x))
        q, k, v = (
            qkv.reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4).unbind(0)
        )
        a = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        h = (a.softmax(-1) @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.ls1.gamma * self.attn.proj(h)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2.gamma * h


class _HubDino(nn.Module):
    """torch-hub DINOv2 key layout: cls_token/pos_embed/patch_embed/blocks/norm."""

    def __init__(self, d=HIDDEN, heads=HEADS, layers=LAYERS, patch=PATCH, img=IMG):
        super().__init__()
        side = img // patch
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, side * side + 1, d) * 0.02)
        self.mask_token = nn.Parameter(torch.zeros(1, d))  # unused, in ckpts
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch, patch)
        self.blocks = nn.ModuleList([_HubBlock(d, heads) for _ in range(layers)])
        self.norm = nn.LayerNorm(d, eps=1e-6)

    def get_intermediate_layers(self, x, idxs):  # norm=True semantics
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        taps = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in idxs:
                taps.append(self.norm(x)[:, 1:])
        return taps


class _ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        return x + self.conv2(F.relu(h))


class _FeatureFusionBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = _ResidualConvUnit(features)
        self.resConfUnit2 = _ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, *xs, size=None):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        if size is None:
            out = F.interpolate(out, scale_factor=2, mode="bilinear",
                                align_corners=True)
        else:
            out = F.interpolate(out, size=size, mode="bilinear",
                                align_corners=True)
        return self.out_conv(out)


class _TorchDPTHead(nn.Module):
    """Depth-Anything-V2 DPT head, exact key layout + forward semantics."""

    def __init__(self, in_dim, features=FEATURES, out_channels=OUT_CHANNELS):
        super().__init__()
        oc = list(out_channels)
        self.projects = nn.ModuleList([nn.Conv2d(in_dim, c, 1) for c in oc])
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, 4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, 2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, 2, 1),
        ])
        self.scratch = nn.Module()
        for i, c in enumerate(oc):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, features, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", _FeatureFusionBlock(features))
        self.scratch.output_conv1 = nn.Conv2d(features, features // 2, 3, 1, 1)
        self.scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, 1, 1), nn.ReLU(True),
            nn.Conv2d(32, 1, 1), nn.ReLU(True),
        )

    def forward(self, taps, patch_hw, out_hw, motion_modules=None):
        hp, wp = patch_hw
        rn = []
        for i, tokens in enumerate(taps):
            x = tokens.permute(0, 2, 1).reshape(
                tokens.shape[0], tokens.shape[2], hp, wp
            )
            x = self.resize_layers[i](self.projects[i](x))
            rn.append(getattr(self.scratch, f"layer{i + 1}_rn")(x))

        def motion(idx, x):
            return motion_modules[idx](x) if motion_modules is not None else x

        path = self.scratch.refinenet4(rn[3], size=rn[2].shape[2:])
        path = motion(0, path)
        path = self.scratch.refinenet3(path, rn[2], size=rn[1].shape[2:])
        path = motion(1, path)
        path = self.scratch.refinenet2(path, rn[1], size=rn[0].shape[2:])
        path = motion(2, path)
        path = self.scratch.refinenet1(path, rn[0])
        path = motion(3, path)
        out = self.scratch.output_conv1(path)
        out = F.interpolate(out, size=out_hw, mode="bilinear", align_corners=True)
        return self.scratch.output_conv2(out)


class _TorchVersatileAttention(nn.Module):
    """AnimateDiff VersatileAttention (Temporal_Self), diffusers-era keys."""

    def __init__(self, dim, heads=8, max_len=32):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(dim, dim, bias=False)
        self.to_v = nn.Linear(dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])
        self.pos_encoder = nn.Module()
        position = torch.arange(max_len).unsqueeze(1).float()
        div = torch.exp(
            torch.arange(0, dim, 2).float() * (-math.log(10000.0) / dim)
        )
        pe = torch.zeros(1, max_len, dim)
        pe[0, :, 0::2] = torch.sin(position * div)
        pe[0, :, 1::2] = torch.cos(position * div)
        self.pos_encoder.register_buffer("pe", pe)

    def forward(self, x, video_length):
        # x: [(t), hw, c] -> temporal sequences [(hw), t, c]
        hw = x.shape[1]
        x = x.permute(1, 0, 2)  # [hw, t, c]
        x = x + self.pos_encoder.pe[:, :video_length]
        b, t, c = x.shape
        hd = c // self.heads

        def split(a):
            return a.reshape(b, t, self.heads, hd).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        out = (attn.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, t, c)
        out = self.to_out[0](out)
        return out.permute(1, 0, 2)  # back to [(t), hw, c]


class _TorchGEGLUFF(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        geglu = nn.Module()
        geglu.proj = nn.Linear(dim, dim * mult * 2)
        self.net = nn.ModuleList(
            [geglu, nn.Dropout(0.0), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class _TorchTemporalBlock(nn.Module):
    def __init__(self, dim, num_attention_blocks=2):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [_TorchVersatileAttention(dim) for _ in range(num_attention_blocks)]
        )
        self.norms = nn.ModuleList(
            [nn.LayerNorm(dim) for _ in range(num_attention_blocks)]
        )
        self.ff = _TorchGEGLUFF(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length) + x
        return self.ff(self.ff_norm(x)) + x


class _TorchMotionModule(nn.Module):
    """AnimateDiff TemporalTransformer3DModel under 'temporal_transformer'."""

    def __init__(self, dim, num_transformer_blocks=1):
        super().__init__()
        tt = nn.Module()
        tt.norm = nn.GroupNorm(min(32, dim), dim)
        tt.proj_in = nn.Linear(dim, dim)
        tt.transformer_blocks = nn.ModuleList(
            [_TorchTemporalBlock(dim) for _ in range(num_transformer_blocks)]
        )
        tt.proj_out = nn.Linear(dim, dim)
        self.temporal_transformer = tt

    def forward(self, x):  # [T, C, H, W]
        tt = self.temporal_transformer
        t, c, h, w = x.shape
        residual = x
        x = tt.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(t, h * w, c)
        x = tt.proj_in(x)
        for block in tt.transformer_blocks:
            x = block(x, video_length=t)
        x = tt.proj_out(x)
        x = x.reshape(t, h, w, c).permute(0, 3, 1, 2)
        return residual + x


class _TorchVDAOracle(nn.Module):
    def __init__(self, with_motion=False):
        super().__init__()
        self.pretrained = _HubDino()
        self.head = _TorchDPTHead(HIDDEN)
        if with_motion:
            self.head.motion_modules = nn.ModuleList(
                [_TorchMotionModule(FEATURES) for _ in range(4)]
            )

    def forward(self, x, out_hw):  # x: [B 3 H W]
        taps = self.pretrained.get_intermediate_layers(x, set(LAYER_IDXS))
        hp, wp = x.shape[2] // PATCH, x.shape[3] // PATCH
        motion = getattr(self.head, "motion_modules", None)
        return self.head(taps, (hp, wp), out_hw, motion_modules=motion)


def _tiny_pair(with_motion=False, frame_chunk=8):
    torch.manual_seed(0)
    oracle = _TorchVDAOracle(with_motion=with_motion).eval()
    # Random init + the head's final ReLU can zero the whole output, which
    # would make every comparison trivially 0 == 0; bias it positive.
    with torch.no_grad():
        oracle.head.scratch.output_conv2[2].bias.add_(1.0)
    vit_config = ViTConfig(hidden_size=HIDDEN, num_layers=LAYERS,
                           num_heads=HEADS, patch_size=PATCH, image_size=IMG)
    head_cfg = {"features": FEATURES, "out_channels": list(OUT_CHANNELS),
                "layer_idxs": list(LAYER_IDXS)}
    est = VideoDepthEstimator(
        encoder="vitb", use_temporal=False,
        use_motion_modules=with_motion, dtype=jnp.float32,
        frame_chunk=frame_chunk, vit_config=vit_config, head_cfg=head_cfg,
    )
    est.params = convert_vda_params(
        oracle.state_dict(), encoder="vitb",
        vit_config=vit_config, head_cfg=head_cfg,
    )
    return oracle, est


def test_converted_params_match_init_structure():
    _, est = _tiny_pair()
    ref = est.__class__(
        encoder="vitb", use_temporal=False, dtype=jnp.float32,
        vit_config=est.vit_config,
        head_cfg={"features": FEATURES, "out_channels": list(OUT_CHANNELS),
                  "layer_idxs": list(LAYER_IDXS)},
    )
    expected = ref.init_params(jax.random.PRNGKey(0), sample_hw=(IMG, IMG))
    got_shapes = jax.tree.map(lambda a: a.shape, est.params)
    want_shapes = jax.tree.map(lambda a: a.shape, expected)
    assert got_shapes == want_shapes


def test_depth_matches_torch_oracle():
    oracle, est = _tiny_pair()
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(frames.transpose(0, 3, 1, 2)), (IMG, IMG)
        ).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(
        est._forward(est.params, jnp.asarray(frames), (IMG, IMG))
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_motion_modules_convert_and_match_torch():
    """AnimateDiff-style temporal motion modules: full conversion parity.

    The oracle carries 4 motion modules under the exact VDA key layout
    (head.motion_modules.{i}.temporal_transformer.*) applied after each
    fusion stage; the converted Flax estimator must reproduce the torch
    depth, with temporal attention doing real cross-frame work.
    """
    # frame_chunk == the clip length: the torch oracle sees exactly these
    # frames, so the Flax group must too (padding would join the attention).
    oracle, est = _tiny_pair(with_motion=True, frame_chunk=4)
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(4, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        expected = oracle(
            torch.from_numpy(frames.transpose(0, 3, 1, 2)), (IMG, IMG)
        ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        est._forward(est.params, jnp.asarray(frames), (IMG, IMG))
    )
    np.testing.assert_allclose(got, expected, atol=1e-3)

    # Temporal coupling is real: permuting frames changes outputs per-frame
    # (a per-frame model would be permutation-equivariant).
    with torch.no_grad():
        permuted = oracle(
            torch.from_numpy(frames[::-1].copy().transpose(0, 3, 1, 2)),
            (IMG, IMG),
        ).numpy().transpose(0, 2, 3, 1)[::-1]
    assert np.abs(permuted - expected).max() > 1e-4


def test_motion_module_structure_inference():
    from tdspa.features.depth import motion_module_structure

    oracle, _ = _tiny_pair(with_motion=True)
    s = motion_module_structure(oracle.state_dict().keys())
    assert s == {"modules": 4, "transformer_blocks": 1,
                 "attention_blocks": 2}
    assert motion_module_structure(["head.projects.0.weight"]) is None


def test_from_checkpoint_roundtrip_with_motion(tmp_path):
    oracle, est = _tiny_pair(with_motion=True)
    path = str(tmp_path / "video_depth_anything_tiny.pth")
    torch.save(oracle.state_dict(), path)
    vit_config = ViTConfig(hidden_size=HIDDEN, num_layers=LAYERS,
                           num_heads=HEADS, patch_size=PATCH, image_size=IMG)
    loaded = VideoDepthEstimator.from_checkpoint(
        path, encoder="vitb", dtype=jnp.float32, vit_config=vit_config,
        head_cfg={"features": FEATURES, "out_channels": list(OUT_CHANNELS),
                  "layer_idxs": list(LAYER_IDXS)},
    )
    assert loaded.head.use_motion_modules
    frames = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    )
    a = np.asarray(loaded._forward(loaded.params, frames, (IMG, IMG)))
    b = np.asarray(est._forward(est.params, frames, (IMG, IMG)))
    np.testing.assert_allclose(a, b, atol=1e-6)
