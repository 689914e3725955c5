"""Sinusoidal positional encodings (reference
``modules/pos_encode.py:8-78``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(
    sequence_length: int,
    n_freqs: int,
    geometric_freq_spacing: bool = False,
    geometric_freq_decay: bool = False,
) -> jax.Array:
    time = jnp.linspace(-jnp.pi, jnp.pi, sequence_length)
    freqs = jnp.linspace(1, sequence_length // 2, n_freqs)
    if geometric_freq_spacing:
        freqs = freqs**2
    scaling = jnp.linspace(1, 1e-8, n_freqs)
    if geometric_freq_decay:
        scaling = scaling**2
    return jnp.sin(time[None, :] * freqs[:, None]) * scaling[:, None]


def pos_encode_feature(x: jax.Array, domain: float, n_freqs: int) -> jax.Array:
    """[x, sin(2^i x), cos(2^i x)...] (reference ``pos_encode.py:37-47``)."""
    x = jnp.clip(x, -domain, domain)
    output = [x]
    for i in range(n_freqs):
        output.append(jnp.sin((2**i) * x))
        output.append(jnp.cos((2**i) * x))
    return jnp.concatenate(output, axis=-1)


def n_features_for_freq(n_freqs: int) -> int:
    return n_freqs * 2 + 1


def pos_encoded(
    batch_size: int, time_dim: int, n_freqs: int, domain: float = 1.0
) -> jax.Array:
    """(batch, time, n_features) sinusoid features (reference
    ``pos_encode.py:54-66``)."""
    n_features = n_features_for_freq(n_freqs)
    grid = jnp.linspace(-domain, domain, time_dim).reshape(-1, 1)
    pos = pos_encode_feature(grid, 1.0, n_freqs).reshape(1, time_dim, n_features)
    return jnp.broadcast_to(pos, (batch_size, time_dim, n_features))


import flax.linen as _nn


class LearnedPosEncodings(_nn.Module):
    """Project sinusoid features and add to the input (reference
    ``modules/pos_encode.py:69-78``)."""

    n_freqs: int
    out_channels: int

    @_nn.compact
    def __call__(self, x):  # (batch, time, out_channels)
        pos = pos_encoded(x.shape[0], x.shape[1], self.n_freqs)
        learned = _nn.Dense(self.out_channels)(pos)
        return x + learned
