"""Gated dilated conv stack (reference ``modules/dilated.py:9-100``).
Public call shape (batch, channels, time)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import uniform_init


class DilatedBlock(nn.Module):
    channels: int
    dilation: int
    padding: Optional[str] = None

    @nn.compact
    def __call__(self, x):  # (batch, time, channels)
        skip = x
        if self.padding == "only-past":
            pad = [(self.dilation * 2, 0)]
        elif self.padding == "only-future":
            pad = [(0, self.dilation * 2)]
        else:
            pad = [(self.dilation, self.dilation)]
        kw = dict(
            kernel_dilation=(self.dilation,),
            padding=pad,
            kernel_init=uniform_init(0.1),
            bias_init=nn.initializers.zeros,
        )
        scale = nn.Conv(self.channels, (3,), **kw)(x)
        gate = nn.Conv(self.channels, (3,), **kw)(x)
        h = jnp.tanh(scale) * jax.nn.sigmoid(gate)
        out = nn.Dense(self.channels)(h)
        nxt = nn.Dense(self.channels)(h) + skip
        return nxt, out


class DilatedStack(nn.Module):
    """Sum of per-block outputs (reference ``dilated.py:60-100``).
    (batch, channels, time) -> (batch, channels, time)."""

    channels: int
    dilations: Sequence[int]
    padding: Optional[str] = None

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        x = jnp.transpose(x, (0, 2, 1))
        n = x
        outputs = jnp.zeros_like(x)
        features = []
        for d in self.dilations:
            n, o = DilatedBlock(self.channels, d, self.padding)(n)
            features.append(n)
            outputs = outputs + o
        outputs = jnp.transpose(outputs, (0, 2, 1))
        if return_features:
            return outputs, [jnp.transpose(f, (0, 2, 1)) for f in features]
        return outputs
