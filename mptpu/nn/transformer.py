"""Fourier-mixer transformer + metaformer (reference
``modules/transformer.py:11-58``, ``modules/metaformer.py:61``)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import uniform_init


class ForwardBlock(nn.Module):
    n_channels: int

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Dense(
            self.n_channels,
            kernel_init=uniform_init(0.1),
            bias_init=nn.initializers.zeros,
        )(x)
        return jax.nn.leaky_relu(x + shortcut, 0.2)


def fourier_mix(x: jax.Array) -> jax.Array:
    """FNet-style token mixing: fft over feature + sequence dims, take the
    real part (reference ``transformer.py:25-33``)."""
    n1, n2 = x.shape[-1], x.shape[-2]
    x = jnp.fft.fft(x, axis=-1) * (1.0 / np.sqrt(n1))
    x = jnp.fft.fft(x, axis=-2) * (1.0 / np.sqrt(n2))
    return x.real


class Transformer(nn.Module):
    """Stack of (dense residual, fourier mixer) (reference
    ``transformer.py:36-58``)."""

    n_channels: int
    n_layers: int
    return_features: bool = False

    @nn.compact
    def __call__(self, x):
        features = []
        for _ in range(self.n_layers):
            x = ForwardBlock(self.n_channels)(x)
            x = fourier_mix(x)
            features.append(x)
        if self.return_features:
            return x, features
        return x


class MetaFormerBlock(nn.Module):
    """Token mixer (pooling) + channel MLP with layernorm residuals — the
    PoolFormer-style block (reference ``modules/metaformer.py``)."""

    channels: int
    pool_size: int = 3

    @nn.compact
    def __call__(self, x):  # (batch, seq, channels)
        h = nn.LayerNorm()(x)
        pad = self.pool_size // 2
        pooled = jax.lax.reduce_window(
            h,
            0.0,
            jax.lax.add,
            window_dimensions=(1, self.pool_size, 1),
            window_strides=(1, 1, 1),
            padding=((0, 0), (pad, pad), (0, 0)),
        ) / self.pool_size
        x = x + (pooled - h)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.channels * 4)(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(self.channels)(h)
        return x + h


class MetaFormer(nn.Module):
    channels: int
    n_layers: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_layers):
            x = MetaFormerBlock(self.channels)(x)
        return x


class FourierMixer(nn.Module):
    """Module form of ``fourier_mix`` (reference ``transformer.py:25-33``)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fourier_mix(x)
