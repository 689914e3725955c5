"""MLP-Mixer stack with block attention (reference
``modules/mixer.py:9-103``). Channels-last internally; dropout is
deterministic-off unless a 'dropout' rng is provided."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import uniform_init


class MixerBlock(nn.Module):
    channels: int
    sequence_length: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pos = self.param(
            "pos", uniform_init(0.01), (1, self.sequence_length, self.channels)
        )
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        skip = x
        tr = jnp.transpose(x, (0, 2, 1))
        tr = nn.Dense(self.channels)(tr)
        tr = nn.Dense(self.sequence_length)(tr)
        tr = jnp.transpose(tr, (0, 2, 1))
        x = nn.Dense(self.channels)(x + pos)
        x = jax.nn.elu(x + tr + skip)
        return nn.LayerNorm()(x)


class MixerAttention(nn.Module):
    channels: int
    sequence_length: int
    n_modules: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = nn.Dense(1)(x).reshape(-1, self.sequence_length)
        attn = nn.Dense(self.n_modules)(attn).reshape(-1, self.n_modules, 1, 1)
        attn = jax.nn.softmax(attn, axis=1)
        outputs = jnp.stack(
            [
                MixerBlock(self.channels, self.sequence_length)(
                    x, deterministic=deterministic
                )
                for _ in range(self.n_modules)
            ],
            axis=1,
        )
        return jnp.sum(outputs * attn, axis=1)


class MixerStack(nn.Module):
    """(batch, seq, in_channels) -> (batch, seq, channels) (reference
    ``mixer.py:78-103``)."""

    in_channels: int
    channels: int
    sequence_length: int
    layers: int
    attn_blocks: int
    channels_last: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if not self.channels_last:
            x = jnp.transpose(x, (0, 2, 1))
        x = nn.Dense(self.channels)(x)
        for _ in range(self.layers):
            x = MixerAttention(
                self.channels, self.sequence_length, self.attn_blocks
            )(x, deterministic=deterministic)
        x = nn.Dense(self.channels)(x)
        if not self.channels_last:
            x = jnp.transpose(x, (0, 2, 1))
        return x
