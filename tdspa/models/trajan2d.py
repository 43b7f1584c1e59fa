"""TRAJAN: the 2D point-track autoencoder, TPU-native.

Capability/weight contract from the reference implementation
(/root/reference/track_autoencoder.py:117-390): a Perceiver-style
encoder->128-token bottleneck->per-query decoder over sets of 2D point
tracks. Parameter tree names and all hyperparameters match the reference so
released checkpoints load unchanged. Architectural quirks that are part of
the trained checkpoint's function are preserved deliberately:

* the decoder's query-frame term ``query_frame // time_scale_factor`` is a
  float floor division that is 0.0 for all frames < 150 — time conditioning
  flows only through ``append_time_feat`` (track_autoencoder.py:311-317);
* bottleneck quantization dithers with a *fixed* ``PRNGKey(0)``
  (track_autoencoder.py:301-306);
* the 2D encoder pools frames by visibility-weighted mean; the declared
  ``input_readout_token`` is unused (track_autoencoder.py:147, 230-232).

TPU-first deviations (same math, better mapping to hardware):

* ``append_time_feat`` is a dynamic channel gather instead of the reference's
  materialized ``eye(128, C)`` matmul (track_autoencoder.py:275-289) — the
  eye-matmul costs O(Q*128*C*128) MXU FLOPs and O(Q*128*C) HBM for the
  multiplier; the gather is O(Q*128*128) bytes and no FLOPs.
* latents are broadcast (not ``jnp.tile``-materialized) per query and only
  materialize at the decoder concat.
* all matmuls run in a configurable compute dtype (bfloat16 by default stays
  off for checkpoint-parity; benchmarks enable it).
"""

from __future__ import annotations

from typing import Any

import einops
from flax import linen as nn
import jax
import jax.numpy as jnp

from tdspa.core.attention import TransformerStack
from tdspa.core.embeddings import ParamStateInit, SinusoidalEmbedding
from tdspa.core.masks import track_temporal_mask
from tdspa.models.containers import (
    TrackAutoEncoderDecoderContext,
    TrackAutoEncoderInputs,
    TrackAutoEncoderResults,
)


def default_query_grid(batch_shape, num_coords: int = 2, grid_size: int = 32):
    """[*B grid_size^2 num_coords] uniform half-pixel-centered query grid at t=0.

    Reference default-grid path (track_autoencoder.py:257-267): x varies
    fastest, optional z filled with zeros for 3D.
    """
    centers = jnp.arange(grid_size) / grid_size + 1.0 / (2 * grid_size)
    qx, qy = jnp.meshgrid(centers, centers)
    coords = [qx, qy] + [jnp.zeros_like(qx)] * (num_coords - 2)
    grid = jnp.reshape(jnp.stack(coords, axis=-1), [-1, num_coords])
    return jnp.broadcast_to(grid, tuple(batch_shape) + grid.shape)


def append_time_feature(latents, query_frame, num_slots: int = 128, stride: int = 5):
    """Append a time-conditioned 128-channel slice of each latent.

    Equivalent to the reference's ``einsum(latents, eye(128, C, 5*t))``
    (track_autoencoder.py:275-289): output channel d of the appendix is latent
    channel ``5*t + d`` when in range, else 0. Implemented as a per-(batch,
    query) dynamic gather along the channel axis — no materialized eye, no
    matmul.

    Args:
      latents: float[*B Q N C] per-query tiled latents.
      query_frame: int[*B Q] frame index per query.

    Returns:
      float[*B Q N C+num_slots].
    """
    channels = latents.shape[-1]
    offsets = query_frame * stride  # [*B Q]
    idx = offsets[..., jnp.newaxis, jnp.newaxis] + jnp.arange(num_slots)  # [*B Q 1 S]
    valid = idx < channels
    gathered = jnp.take_along_axis(
        latents, jnp.clip(idx, 0, channels - 1), axis=-1
    )  # broadcasts over N -> [*B Q N S]
    to_append = jnp.where(valid, gathered, 0.0)
    return jnp.concatenate([latents, to_append], axis=-1)


def quantize_latents(latents, levels: float = 128.0):
    """Clip to [-1, 1], round to a 1/levels grid with fixed-key dither + STE.

    Preserves the reference's deterministic dither (track_autoencoder.py:
    298-307): the uniform noise is drawn from ``PRNGKey(0)`` every call.
    """
    latents = jnp.clip(latents, -1.0, 1.0)
    latents_disc = jnp.round(latents * levels) / levels
    rng = jax.random.PRNGKey(0)
    latents_disc = (
        latents_disc
        + jax.random.uniform(rng, latents_disc.shape) / levels
        - 1.0 / (2 * levels)
    )
    return latents - jax.lax.stop_gradient(latents - latents_disc)


class TrackAutoEncoder(nn.Module):
    """TRAJAN 2D track autoencoder (~60M params at defaults)."""

    num_output_frames: int = 150
    num_latent_tokens: int = 128
    latent_token_dim: int = 64
    num_frequencies: int = 32
    track_scale_factor: float = 1.0
    time_scale_factor: float = 150.0
    track_token_dim: int = 256
    encoder_latent_dim: int = 512
    decoder_num_channels: int = 1024
    decoder_scan_chunk_size: int | None = None
    # Memory-bounded encode: nn.scan + remat over support-track chunks
    # (per-track encode is independent across tracks; chunked == unchunked).
    encoder_scan_chunk_size: int | None = None
    dtype: Any = jnp.float32
    # Use the fused Pallas attention kernel on TPU where applicable
    # (key-only masks, VMEM-sized tiles); falls back to XLA elsewhere.
    fused_attention: bool = False
    # int8 dynamic quantization of every transformer-stack projection/MLP
    # matmul (2x MXU rate on v5e, ~90% of model FLOPs; identical param
    # tree — see tdspa/core/quant.py). Inference-path knob.
    quantize: bool = False
    # Residual-stream activation dtype (f32 default = reference numerics;
    # bf16 halves residual/elementwise HBM traffic — inference-path knob).
    residual_dtype: Any = jnp.float32
    # Whole-block Pallas kernel for unmasked self-attention stacks (the
    # decode hot path; see tdspa/core/attention.py ParallelTransformerBlock
    # .fused_block). Inference-only knob; same param tree.
    fused_block: bool = False

    # Transformer stack shapes. Defaults match the reference exactly
    # (track_autoencoder.py:148-171); exposed as config for scaling studies
    # and fast tests.
    num_heads: int = 8
    qkv_size: int = 64 * 8
    input_track_layers: int = 2
    input_track_mlp: int = 1024
    tracks_to_latents_layers: int = 6
    tracks_to_latents_mlp: int = 2048
    decompress_layers: int = 3
    decompress_mlp: int = 2048
    readout_layers: int = 4
    readout_mlp: int = 1024

    def setup(self):
        self.initializer = ParamStateInit(
            shape=(self.num_latent_tokens, self.encoder_latent_dim)
        )
        self.track_token_projection = nn.Dense(self.track_token_dim, dtype=self.dtype)
        self.sinusoidal_embedding = SinusoidalEmbedding(
            num_frequencies=self.num_frequencies
        )
        self.compressor = nn.Dense(self.latent_token_dim, dtype=self.dtype)
        self.decompressor = nn.Dense(
            self.decoder_num_channels - 128, dtype=self.dtype
        )
        # Declared (and present in reference checkpoints' module tree) but
        # unused by the 2D pooling path — kept for structural parity.
        self.input_readout_token = ParamStateInit(shape=(1, self.track_token_dim))
        self.input_track_transformer = TransformerStack(
            qkv_size=self.qkv_size, num_heads=self.num_heads,
            mlp_size=self.input_track_mlp, num_layers=self.input_track_layers,
            dtype=self.dtype, use_fused=self.fused_attention,
            quantize=self.quantize,
            residual_dtype=self.residual_dtype,
            fused_block=self.fused_block,
        )
        self.tracks_to_latents = TransformerStack(
            qkv_size=self.qkv_size, num_heads=self.num_heads,
            mlp_size=self.tracks_to_latents_mlp,
            num_layers=self.tracks_to_latents_layers, dtype=self.dtype,
            use_fused=self.fused_attention,
            quantize=self.quantize,
            residual_dtype=self.residual_dtype,
            fused_block=self.fused_block,
        )
        self.decompress_attn = TransformerStack(
            qkv_size=self.qkv_size, num_heads=self.num_heads,
            mlp_size=self.decompress_mlp, num_layers=self.decompress_layers,
            dtype=self.dtype, use_fused=self.fused_attention,
            quantize=self.quantize,
            residual_dtype=self.residual_dtype,
            fused_block=self.fused_block,
        )
        self.track_readout_attn = TransformerStack(
            qkv_size=self.qkv_size, num_heads=self.num_heads,
            mlp_size=self.readout_mlp, num_layers=self.readout_layers,
            dtype=self.dtype, use_fused=self.fused_attention,
            quantize=self.quantize,
            residual_dtype=self.residual_dtype,
            fused_block=self.fused_block,
        )
        self.query_encoder = nn.Dense(self.decoder_num_channels, dtype=self.dtype)
        self.track_predictor = nn.Dense(
            self.num_output_frames * 4, dtype=self.dtype
        )

    # ------------------------------------------------------------------ #
    # Encoder
    # ------------------------------------------------------------------ #

    def encode_point_identities(self, query_points):  # [*B Q 2] -> [*B Q 4F]
        """Sinusoidal identity embedding of spatial query coordinates."""
        return self.sinusoidal_embedding(query_points / self.track_scale_factor)

    def embed_track_pos_visible(self, tracks, visible):
        """[*B N T 2] -> [*B N T 6F]: sinusoid of (x, y, t/T)."""
        num_frames = tracks.shape[-2]
        fr_id = jnp.arange(num_frames) / num_frames
        fr_id = jnp.broadcast_to(
            fr_id[jnp.newaxis, jnp.newaxis, :, jnp.newaxis], visible.shape
        )
        tracks = jnp.concatenate([tracks, fr_id], axis=-1)
        return self.sinusoidal_embedding(tracks / self.track_scale_factor)

    def encode_tracks(self, tracks, visible, restart):
        """Per-track temporal transformer + visibility-weighted mean pooling.

        Keys that are invisible or past ``restart`` (boundary_frame) are
        masked out; pooling weights are per-frame visibility
        (reference track_autoencoder.py:205-232).
        """
        track_tokens = self.track_token_projection(
            self.embed_track_pos_visible(tracks=tracks, visible=visible)
        )
        mask = track_temporal_mask(visible, restart)
        track_tokens = self.input_track_transformer(track_tokens, qq_mask=mask)
        vis = visible[..., 0].astype(bool)[..., jnp.newaxis]
        return jnp.sum(track_tokens * vis, axis=-2) / jnp.maximum(
            1.0, jnp.sum(vis, axis=-2)
        )

    def encode(self, inputs: TrackAutoEncoderInputs):  # -> float['B 128 64']
        if self.encoder_scan_chunk_size is None:
            support_track_tokens = self.encode_tracks(
                tracks=inputs["support_tracks"],
                visible=inputs["support_tracks_visible"],
                restart=inputs["boundary_frame"],
            )
        else:
            h = self.encoder_scan_chunk_size
            num_tracks = inputs["support_tracks"].shape[-3]
            if num_tracks % h:
                raise ValueError(
                    f"encoder_scan_chunk_size={h} must divide the support "
                    f"track count {num_tracks}"
                )

            def chunk(x):  # [... (G H) T C] -> [... G H T C]
                return einops.rearrange(x, "... (G H) T C -> ... G H T C", H=h)

            def scan_fn(mdl, carry, xs):
                tokens = mdl.encode_tracks(
                    tracks=xs["tracks"],
                    visible=xs["visible"],
                    restart=inputs["boundary_frame"],
                )
                return carry, tokens

            scan = nn.scan(
                nn.remat(scan_fn, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False, "default": True},
                in_axes=-4,
                out_axes=-3,
            )
            xs = {
                "tracks": chunk(inputs["support_tracks"]),
                "visible": chunk(inputs["support_tracks_visible"]),
            }
            _, tokens = scan(self, False, xs)  # [... G H D]
            support_track_tokens = einops.rearrange(
                tokens, "... G H D -> ... (G H) D", H=h
            )
        latents = self.initializer(
            batch_shape=(inputs["support_tracks"].shape[0],)
        )
        latents = self.tracks_to_latents(latents, support_track_tokens)
        # Public boundary: latents stay f32 regardless of compute dtype (the
        # 1/128 quantization grid needs full mantissa).
        return self.compressor(latents).astype(jnp.float32)

    # ------------------------------------------------------------------ #
    # Decoder
    # ------------------------------------------------------------------ #

    @nn.remat
    def get_decoder_context(self, inputs) -> TrackAutoEncoderDecoderContext:
        """Split query (t | x,y), sinusoid-embed identities; default 32x32 grid."""
        if "query_points" in inputs:
            decoder_query = inputs["query_points"][..., 1:]
            query_frame = jnp.round(inputs["query_points"][..., 0]).astype(jnp.int32)
        else:
            decoder_query = default_query_grid(
                inputs["support_tracks"].shape[:-3], num_coords=2
            )
            query_frame = jnp.zeros(decoder_query.shape[:-1], jnp.int32)
        decoder_query = self.encode_point_identities(query_points=decoder_query)
        return TrackAutoEncoderDecoderContext(
            decoder_query=decoder_query,
            query_frame=query_frame,
            boundary_frame=inputs["boundary_frame"],
        )

    def append_time_feat(self, latents, query_frame):
        return append_time_feature(latents, query_frame)

    @nn.remat
    def decode(
        self,
        latents,  # float['*B 128 64']
        decoder_context: TrackAutoEncoderDecoderContext,
        discretize: bool = True,
    ) -> TrackAutoEncoderResults:
        if discretize:
            latents = quantize_latents(latents)
        else:
            latents = jnp.clip(latents, -1.0, 1.0)
        latents = self.decompressor(latents)
        latents = self.decompress_attn(latents)

        # Query token: sinusoid of (identity-embedding, dead time term).
        # ``query_frame // time_scale_factor`` floors to 0.0 for t < 150 —
        # preserved quirk (reference track_autoencoder.py:311-317).
        queries = jnp.concatenate(
            [
                decoder_context.decoder_query,
                decoder_context.query_frame[..., jnp.newaxis]
                // self.time_scale_factor,
            ],
            axis=-1,
        )
        query_tokens = self.query_encoder(
            self.sinusoidal_embedding(queries / self.track_scale_factor)
        )  # [*B Q C]

        num_queries = query_tokens.shape[-2]
        latents = jnp.broadcast_to(
            latents[..., jnp.newaxis, :, :],
            latents.shape[:-2] + (num_queries,) + latents.shape[-2:],
        )  # [*B Q N C-128]
        latents = self.append_time_feat(latents, decoder_context.query_frame)
        tokens = jnp.concatenate(
            [query_tokens[..., jnp.newaxis, :], latents], axis=-2
        )  # [*B Q N+1 C]
        out = self.track_readout_attn(tokens)[..., 0, :]
        out = self.track_predictor(out).astype(jnp.float32)

        num_frames = self.num_output_frames
        tracks = jnp.stack(
            [out[..., :num_frames], out[..., num_frames : 2 * num_frames]],
            axis=-1,
        )
        visible_logits = out[..., 2 * num_frames : 3 * num_frames, jnp.newaxis]
        certain_logits = out[..., 3 * num_frames :, jnp.newaxis]
        return TrackAutoEncoderResults(
            tracks=tracks,
            visible_logits=visible_logits,
            certain_logits=certain_logits,
        )

    # ------------------------------------------------------------------ #
    # Forward
    # ------------------------------------------------------------------ #

    def __call__(self, inputs: TrackAutoEncoderInputs) -> TrackAutoEncoderResults:
        latents = self.encode(inputs)
        if self.decoder_scan_chunk_size is None:
            decoder_context = self.get_decoder_context(inputs)
            outputs = self.decode(latents=latents, decoder_context=decoder_context)
        else:
            # Memory-bounded decode: nn.scan over contiguous query chunks.
            # The boolean carry creates a sequential dependency so XLA
            # schedules chunks one at a time (reference
            # track_autoencoder.py:350-382).
            def scan_fn(mdl, carry, qp):
                chunk_inputs = TrackAutoEncoderInputs(
                    query_points=qp + carry,
                    boundary_frame=inputs["boundary_frame"],
                )
                ctx = mdl.get_decoder_context(chunk_inputs)
                res = mdl.decode(latents, ctx)
                return jnp.sum(res.tracks) > 1e20, res

            scan = nn.scan(
                scan_fn,
                variable_broadcast="params",
                split_rngs={"params": False, "default": True},
                in_axes=-3,
                out_axes=-4,
            )
            h = self.decoder_scan_chunk_size
            _, preds = scan(
                self,
                False,
                einops.rearrange(
                    inputs["query_points"], "... (Q H) C -> ... Q H C", H=h
                ),
            )
            outputs = jax.tree_util.tree_map(
                lambda x: einops.rearrange(x, "... Q H T C -> ... (Q H) T C", H=h),
                preds,
            )

        return TrackAutoEncoderResults(
            tracks=outputs.tracks,
            visible_logits=outputs.visible_logits,
            certain_logits=outputs.certain_logits,
        )
