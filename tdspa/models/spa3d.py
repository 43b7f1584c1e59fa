"""3DSPA: the 3D semantic point-track autoencoder, TPU-native.

Capability/weight contract from the reference
(/root/reference/track_autoencoder_3d.py:43-357): extends TRAJAN to 3D
(x, y, z) tracks, adds residual DINOv2 (768-d) and depth (256-d) feature
projections into the track tokens, and pools each track's frame tokens
through a learnable readout token instead of a visibility-weighted mean.
Parameter tree and hyperparameters match the reference exactly.

Quirks preserved because they are part of the trained checkpoint's function:
the dead decoder time term and the fixed-key dither (see trajan2d.py), and
``certain_logits`` hard-coded to zeros (track_autoencoder_3d.py:299-301).

Intended-behavior fix: the reference's readout attention mask construction is
shape-inconsistent for T>1 (track_autoencoder_3d.py:167-180 concatenates a
[*B,N,1,1] block onto [*B,N,T,T] along the row axis — it cannot execute); the
intended [*B,N,T+1,T+1] mask with an always-attendable readout key column is
built by ``tdspa.core.masks.readout_temporal_mask``.
"""

from __future__ import annotations

from typing import Any

import einops
from flax import linen as nn
import jax
import jax.numpy as jnp

from tdspa.core.attention import TransformerStack
from tdspa.core.embeddings import ParamStateInit, SinusoidalEmbedding
from tdspa.core.masks import readout_temporal_mask
from tdspa.models.containers import (
    TrackAutoEncoder3DInputs,
    TrackAutoEncoderDecoderContext,
    TrackAutoEncoderResults,
)
from tdspa.models.trajan2d import (
    append_time_feature,
    default_query_grid,
    quantize_latents,
)


class TrackAutoEncoder3D(nn.Module):
    """3DSPA 3D track autoencoder (~94M params at defaults)."""

    num_output_frames: int = 150
    num_latent_tokens: int = 128
    latent_token_dim: int = 96
    num_frequencies: int = 32
    track_scale_factor: float = 1.0
    time_scale_factor: float = 150.0
    track_token_dim: int = 384
    encoder_latent_dim: int = 512
    decoder_num_channels: int = 1280
    dino_feature_dim: int = 768
    depth_feature_dim: int = 256
    use_dino: bool = True
    use_depth: bool = True
    decoder_scan_chunk_size: int | None = None
    # Memory-bounded ENCODE: nn.scan + remat over contiguous support-track
    # chunks (the per-track temporal transformer is independent across
    # tracks, so chunked == unchunked exactly). The reference has no
    # encoder-side memory knob — its decoder-only nn.scan
    # (track_autoencoder.py:350-382) leaves the [B,N,T+1,qkv] encoder
    # activations unbounded, which is what blocks the batch-64 x 2048-track
    # operating point on a 16 GB chip.
    encoder_scan_chunk_size: int | None = None
    dtype: Any = jnp.float32
    # Use the fused Pallas attention kernel on TPU where applicable
    # (key-only masks, VMEM-sized tiles); falls back to XLA elsewhere.
    fused_attention: bool = False
    # int8 dynamic quantization of every transformer-stack projection/MLP
    # matmul (2x MXU rate on v5e, ~90% of model FLOPs; identical param
    # tree — see tdspa/core/quant.py). Inference-path knob.
    quantize: bool = False
    # Residual-stream activation dtype for every transformer stack. f32
    # (default) matches the reference numerics; bf16 halves the residual /
    # elementwise HBM traffic the decode profile showed dominating non-matmul
    # time (docs/BENCHMARKS.md "Decode profile"). Inference-path knob; the
    # param tree is unchanged.
    residual_dtype: Any = jnp.float32
    # Whole-block Pallas kernel for unmasked self-attention stacks (the
    # decode hot path; see tdspa/core/attention.py ParallelTransformerBlock
    # .fused_block). Inference-only knob; same param tree.
    fused_block: bool = False

    # Transformer stack shapes. Defaults match the reference exactly
    # (track_autoencoder_3d.py:89-112); exposed as config for scaling
    # studies and fast tests.
    num_heads: int = 8
    qkv_size: int = 96 * 8
    input_track_layers: int = 3
    input_track_mlp: int = 1536
    tracks_to_latents_layers: int = 4
    tracks_to_latents_mlp: int = 2048
    decompress_layers: int = 4
    decompress_mlp: int = 2048
    readout_layers: int = 4
    readout_mlp: int = 1536

    def setup(self):
        self.initializer = ParamStateInit(
            shape=(self.num_latent_tokens, self.encoder_latent_dim)
        )
        self.track_token_projection = nn.Dense(self.track_token_dim, dtype=self.dtype)
        # The reference declares Dense(768) / Dense(256) here
        # (track_autoencoder_3d.py:77-79), whose outputs cannot be added to
        # the track_token_dim-wide embeddings at track_autoencoder_3d.py:
        # 140-147 (shape mismatch — the reference path crashes when features
        # are supplied). The intended residual add requires projecting to
        # track_token_dim.
        if self.use_dino:
            self.dino_projection = nn.Dense(self.track_token_dim, dtype=self.dtype)
        if self.use_depth:
            self.depth_projection = nn.Dense(self.track_token_dim, dtype=self.dtype)
        self.sinusoidal_embedding = SinusoidalEmbedding(
            num_frequencies=self.num_frequencies
        )
        self.compressor = nn.Dense(self.latent_token_dim, dtype=self.dtype)
        self.decompressor = nn.Dense(self.decoder_num_channels - 128, dtype=self.dtype)
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
        self.track_predictor = nn.Dense(self.num_output_frames * 4, dtype=self.dtype)

    # ------------------------------------------------------------------ #
    # Encoder
    # ------------------------------------------------------------------ #

    def encode_point_identities(self, query_points):  # [*B Q 3] -> [*B Q 6F]
        return self.sinusoidal_embedding(query_points / self.track_scale_factor)

    def embed_track_pos_visible(
        self, tracks, visible, dino_features=None, depth_features=None
    ):
        """[*B N T 3] -> [*B N T track_token_dim] with residual feature adds.

        Sinusoid of (x, y, z, t/T) projected to the token width; DINOv2 and
        depth features are linearly projected and added residually
        (reference track_autoencoder_3d.py:123-149). Visibility does not enter
        the features — it only gates attention and pooling.
        """
        num_frames = tracks.shape[-2]
        fr_id = jnp.arange(num_frames) / num_frames
        fr_id = jnp.broadcast_to(
            fr_id[jnp.newaxis, jnp.newaxis, :, jnp.newaxis], visible.shape
        )
        tracks_with_time = jnp.concatenate([tracks, fr_id], axis=-1)
        track_embeddings = self.track_token_projection(
            self.sinusoidal_embedding(tracks_with_time / self.track_scale_factor)
        )
        if self.use_dino and dino_features is not None:
            track_embeddings = track_embeddings + self.dino_projection(dino_features)
        if self.use_depth and depth_features is not None:
            track_embeddings = track_embeddings + self.depth_projection(depth_features)
        return track_embeddings

    def encode_tracks(
        self, tracks, visible, restart, dino_features=None, depth_features=None
    ):
        """Per-track temporal transformer; the readout token's slot is the
        track summary (reference track_autoencoder_3d.py:151-188)."""
        track_embeddings = self.embed_track_pos_visible(
            tracks=tracks,
            visible=visible,
            dino_features=dino_features,
            depth_features=depth_features,
        )
        batch_shape = track_embeddings.shape[:-2]
        readout_token = self.input_readout_token(batch_shape)
        track_tokens = jnp.concatenate([readout_token, track_embeddings], axis=-2)

        mask = readout_temporal_mask(visible, restart)
        track_tokens = self.input_track_transformer(track_tokens, qq_mask=mask)
        return track_tokens[..., 0, :]

    def encode(self, inputs: TrackAutoEncoder3DInputs):  # -> float['B 128 96']
        if self.encoder_scan_chunk_size is None:
            support_track_tokens = self.encode_tracks(
                tracks=inputs["support_tracks"],
                visible=inputs["support_tracks_visible"],
                restart=inputs["boundary_frame"],
                dino_features=inputs.get("dino_features"),
                depth_features=inputs.get("depth_features"),
            )
        else:
            # Chunk the N (support-track) axis; remat the body so backward
            # holds one chunk's activations at a time.
            h = self.encoder_scan_chunk_size
            num_tracks = inputs["support_tracks"].shape[-3]
            if num_tracks % h:
                raise ValueError(
                    f"encoder_scan_chunk_size={h} must divide the support "
                    f"track count {num_tracks}"
                )

            def chunk(x):  # [... (G H) T C] -> [... G H T C]
                return einops.rearrange(x, "... (G H) T C -> ... G H T C", H=h)

            xs = {
                "tracks": chunk(inputs["support_tracks"]),
                "visible": chunk(inputs["support_tracks_visible"]),
            }
            if inputs.get("dino_features") is not None:
                xs["dino"] = chunk(inputs["dino_features"])
            if inputs.get("depth_features") is not None:
                xs["depth"] = chunk(inputs["depth_features"])

            def scan_fn(mdl, carry, xs):
                tokens = mdl.encode_tracks(
                    tracks=xs["tracks"],
                    visible=xs["visible"],
                    restart=inputs["boundary_frame"],
                    dino_features=xs.get("dino"),
                    depth_features=xs.get("depth"),
                )
                return carry, tokens

            scan = nn.scan(
                nn.remat(scan_fn, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False, "default": True},
                in_axes=-4,
                out_axes=-3,
            )
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
        if "query_points" in inputs:
            decoder_query = inputs["query_points"][..., 1:]  # (x, y, z)
            query_frame = jnp.round(inputs["query_points"][..., 0]).astype(jnp.int32)
        else:
            decoder_query = default_query_grid(
                inputs["support_tracks"].shape[:-3], num_coords=3
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
        self, latents, decoder_context, discretize: bool = True
    ) -> TrackAutoEncoderResults:
        if discretize:
            latents = quantize_latents(latents)
        else:
            latents = jnp.clip(latents, -1.0, 1.0)
        latents = self.decompressor(latents)
        latents = self.decompress_attn(latents)

        queries = jnp.concatenate(
            [
                decoder_context.decoder_query,
                decoder_context.query_frame[..., jnp.newaxis]
                // self.time_scale_factor,  # dead for t < 150; preserved quirk
            ],
            axis=-1,
        )
        query_tokens = self.query_encoder(
            self.sinusoidal_embedding(queries / self.track_scale_factor)
        )

        num_queries = query_tokens.shape[-2]
        latents = jnp.broadcast_to(
            latents[..., jnp.newaxis, :, :],
            latents.shape[:-2] + (num_queries,) + latents.shape[-2:],
        )
        latents = self.append_time_feat(latents, decoder_context.query_frame)
        tokens = jnp.concatenate(
            [query_tokens[..., jnp.newaxis, :], latents], axis=-2
        )
        out = self.track_readout_attn(tokens)[..., 0, :]
        out = self.track_predictor(out).astype(jnp.float32)

        num_frames = self.num_output_frames
        tracks = jnp.stack(
            [
                out[..., :num_frames],
                out[..., num_frames : 2 * num_frames],
                out[..., 2 * num_frames : 3 * num_frames],
            ],
            axis=-1,
        )
        visible_logits = out[..., 3 * num_frames :, jnp.newaxis]
        # 3DSPA only predicts visibility; certainty is defined as zeros
        # (reference track_autoencoder_3d.py:299-301).
        certain_logits = jnp.zeros_like(visible_logits)
        return TrackAutoEncoderResults(
            tracks=tracks,
            visible_logits=visible_logits,
            certain_logits=certain_logits,
        )

    # ------------------------------------------------------------------ #
    # Forward
    # ------------------------------------------------------------------ #

    def __call__(self, inputs: TrackAutoEncoder3DInputs) -> TrackAutoEncoderResults:
        latents = self.encode(inputs)
        if self.decoder_scan_chunk_size is None:
            decoder_context = self.get_decoder_context(inputs)
            outputs = self.decode(latents=latents, decoder_context=decoder_context)
        else:
            def scan_fn(mdl, carry, qp):
                chunk_inputs = TrackAutoEncoder3DInputs(
                    query_points=qp + carry,
                    boundary_frame=inputs["boundary_frame"],
                    support_tracks=inputs["support_tracks"],
                    support_tracks_visible=inputs["support_tracks_visible"],
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
