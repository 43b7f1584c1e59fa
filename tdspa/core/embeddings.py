"""Coordinate embedding and learnable-state primitives.

Behavioral contract mirrors the reference primitives
(/root/reference/track_autoencoder.py:18-53): a third-octave geometric
frequency ladder ``2**(i/3)`` (NOT the usual 10000^(i/d) transformer ladder),
cos folded into sin via a +pi/2 phase shift, and concatenated (not
interleaved) sin/cos blocks. Parameter names match the reference so released
checkpoints load unchanged.
"""

from __future__ import annotations

import functools

from flax import linen as nn
import jax.numpy as jnp


class SinusoidalEmbedding(nn.Module):
    """Fourier features over a third-octave frequency ladder.

    For input ``x`` with ``C`` trailing coordinates, produces
    ``[sin(x*s_0..s_F), sin(x*s_0..s_F + pi/2)]`` per coordinate, flattened to
    ``C * 2 * num_frequencies`` channels with layout
    ``(coord, [sin_block, cos_block])`` — i.e. per coordinate the F sin values
    then the F cos values (reference track_autoencoder.py:28-37).
    """

    num_frequencies: int

    @nn.compact
    def __call__(self, inputs):  # float['*B C'] -> float['*B C*2F']
        scales = jnp.asarray(
            [2 ** (i / 3) for i in range(self.num_frequencies)],
            dtype=inputs.dtype if jnp.issubdtype(inputs.dtype, jnp.floating) else jnp.float32,
        )
        # (..., C) * (F,) -> (..., C, F)
        x = inputs[..., jnp.newaxis] * scales
        # cos(x) == sin(x + pi/2); concatenate on the frequency axis so the
        # per-coordinate layout is [sin..., cos...].
        out = jnp.sin(jnp.concatenate([x, x + 0.5 * jnp.pi], axis=-1))
        # (..., C, 2F) -> (..., C*2F): coordinate-major flatten.
        return out.reshape(out.shape[:-2] + (out.shape[-2] * out.shape[-1],))


class ParamStateInit(nn.Module):
    """A learnable tensor broadcast over leading batch dimensions.

    Used for the latent seed tokens and the encoder readout token. Parameter
    name ``state_init`` ~ Normal(0, 1) matches the reference
    (track_autoencoder.py:41-53).
    """

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self, batch_shape):  # -> float['*B *shape']
        init_fn = functools.partial(nn.initializers.normal, stddev=1.0)
        param = self.param("state_init", init_fn(), self.shape)
        return jnp.broadcast_to(param, tuple(batch_shape) + tuple(param.shape))
