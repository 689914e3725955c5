"""1-D UNet + downsampling discriminator (reference
``modules/unet.py:9-201``). Public call shape (batch, channels, time)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.stft import stft
from .init import uniform_init


class _Down(nn.Module):
    channels: int
    norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, train: bool = False):
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Conv(
            self.channels, (3,), strides=(2,), padding=[(1, 1)],
            kernel_init=uniform_init(0.1), bias_init=nn.initializers.zeros,
        )(x)
        x = jax.nn.leaky_relu(x, 0.2)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        return x


class _Up(nn.Module):
    channels: int
    norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, train: bool = False):
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.ConvTranspose(
            self.channels, (4,), strides=(2,), padding=[(1, 1)],
            kernel_init=uniform_init(0.1), bias_init=nn.initializers.zeros,
        )(x)
        x = jax.nn.leaky_relu(x, 0.2)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        return x


class UNet(nn.Module):
    """5-level 1-D UNet over (batch, channels, time=128) with additive skip
    connections, optionally acting as a discriminator head (reference
    ``unet.py:70-201``)."""

    channels: int
    is_disc: bool = False
    norm: bool = True
    out_channels: int = 4096
    levels: int = 5

    @nn.compact
    def __call__(self, x, deterministic: bool = True, train: bool = False):
        x = jnp.transpose(x, (0, 2, 1))  # (batch, time, channels)
        context = {}
        for _ in range(self.levels):
            x = _Down(self.channels, self.norm)(x, deterministic, train)
            context[x.shape[1]] = x
        if self.is_disc:
            x = nn.Conv(
                1, (4,), strides=(4,), padding="VALID",
                kernel_init=uniform_init(0.1),
            )(x)
            return jnp.transpose(x, (0, 2, 1))
        for _ in range(self.levels):
            x = _Up(self.channels, self.norm)(x, deterministic, train)
            if x.shape[1] in context:
                x = x + context[x.shape[1]]
        x = nn.Dense(self.out_channels, kernel_init=uniform_init(0.1))(x)
        return jnp.transpose(x, (0, 2, 1))


class DownsamplingDiscriminator(nn.Module):
    """STFT -> 1x1 proj -> log2(frames)-2 stride-2 convs -> judge conv
    (reference ``unet.py:23-67``)."""

    window_size: int
    step_size: int
    n_samples: int
    channels: int
    complex_valued: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        batch = x.shape[0]
        n_frames = self.n_samples // self.step_size
        n_coeffs = self.window_size // 2 + 1
        input_channels = n_coeffs * 2 if self.complex_valued else n_coeffs
        s = stft(
            x,
            ws=self.window_size,
            step=self.step_size,
            pad=True,
            return_complex=self.complex_valued,
        ).reshape(batch, -1, input_channels)  # (batch, frames, coeffs)
        s = nn.Dense(self.channels, kernel_init=uniform_init(0.1))(s)
        n_layers = int(np.log2(n_frames)) - 2
        for _ in range(n_layers):
            s = _Down(self.channels)(s, deterministic)
        s = nn.Conv(
            1, (4,), strides=(4,), padding="VALID",
            kernel_init=uniform_init(0.1),
        )(s)
        return jnp.transpose(s, (0, 2, 1))
