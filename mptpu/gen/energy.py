"""Energy-conserving block instrument (reference ``energy.py:23-152``):
audio is processed as non-overlapping sample blocks projected into a
model dimension; each layer injects its activations into a bank of
decaying lines via FFT convolution (energy can only decay between
blocks), and a discontinuity penalty keeps block boundaries continuous.

TPU design: blocks are a reshape (no unfold), the decay-line convolution
is one batched rFFT product per layer, and the whole model is a flax
module over (batch, time_blocks, channels) activations.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.fft import fft_convolve
from ..nn.init import uniform_init


def to_blocks(x: jax.Array, block_size: int) -> jax.Array:
    """(batch, channels, n) -> (batch, channels, n_blocks, block_size)
    (reference ``to_blocks``, ``energy.py:23-25``)."""
    b, c, n = x.shape
    return x.reshape(b, c, n // block_size, block_size)


def blocks_to_samples(x: jax.Array) -> jax.Array:
    """Inverse of ``to_blocks`` (reference ``to_samples``)."""
    *lead, t, bs = x.shape
    return x.reshape(*lead, t * bs)


def compute_discontinuity(x: jax.Array) -> jax.Array:
    """Sum |last sample of block i - first sample of block i+1|
    (reference ``compute_discontinuity``, ``energy.py:48-53``)."""
    last = x[..., :-1, -1]
    first = x[..., 1:, 0]
    return jnp.abs(last - first).sum()


class EnergyBlock(nn.Module):
    """One layer: project, convolve activations with per-channel decay
    lines (energy injected then monotonically released), gated
    nonlinearity (reference ``Block``, ``energy.py:56-104``)."""

    channels: int
    non_linearity: Callable[[jax.Array], jax.Array] = jnp.tanh
    line_len: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proj = nn.Dense(self.channels, use_bias=False,
                        kernel_init=uniform_init(0.05))
        values = nn.Dense(self.channels, use_bias=False,
                          kernel_init=uniform_init(0.05))
        gain = self.param(
            "gain",
            lambda k, s: jax.random.uniform(k, s, minval=0.01, maxval=1.0),
            (1, 1, self.channels),
        )
        pow_ = self.param(
            "pow",
            lambda k, s: jax.random.uniform(k, s, minval=-6.0, maxval=6.0),
            (1, self.channels, 1),
        )
        x = proj(x)
        v = values(x)  # (batch, time, channels)
        time = v.shape[1]
        line = jnp.linspace(1.0, 0.0, self.line_len)[None, None, :]
        line = jnp.pad(line, ((0, 0), (0, 0), (0, max(0, time - self.line_len))))
        line = line[..., :time]
        z = line ** (2.0 + jax.nn.sigmoid(pow_) * 100.0)  # (1, C, time)
        out = fft_convolve(z, jnp.swapaxes(v, 1, 2))      # (b, C, time)
        out = jnp.swapaxes(out, 1, 2)
        return self.non_linearity(out * gain)


class EnergyInstrumentModel(nn.Module):
    """Blocks in, blocks out (reference ``EnergyInstrumentModel``,
    ``energy.py:124-152``). Input: (batch, input_channels, n_samples)
    control/excitation signal; output: (batch, 1, n_samples) audio."""

    input_channels: int = 1
    model_channels: int = 128
    block_size: int = 512
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, c, n = x.shape
        blocked = to_blocks(x, self.block_size)               # (b,c,T,bs)
        t = blocked.shape[2]
        blocked = jnp.swapaxes(blocked, 1, 2).reshape(b, t, -1)
        h = nn.Dense(self.model_channels, use_bias=False,
                     kernel_init=uniform_init(0.05))(blocked)
        for _ in range(self.n_layers):
            h = EnergyBlock(self.model_channels)(h)
        out = nn.Dense(self.block_size, use_bias=False,
                       kernel_init=uniform_init(0.05))(h)     # (b,T,bs)
        return out.reshape(b, 1, t * self.block_size)

    def block_view(self, audio: jax.Array) -> jax.Array:
        return to_blocks(audio, self.block_size)
