"""Residual MLP stacks — every latent head in the framework uses these
(reference ``modules/linear.py:6-110``)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import unit_norm
from .init import uniform_init


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.2)


class ResidualBlock(nn.Module):
    channels: int
    use_bias: bool = True
    shortcut: bool = True
    unit_norm_out: bool = False
    init_scale: float = 0.1
    activation: Callable = _leaky_relu

    @nn.compact
    def __call__(self, x):
        shortcut = x
        kw = dict(
            use_bias=self.use_bias,
            kernel_init=uniform_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )
        x = nn.Dense(self.channels, **kw)(x)
        x = self.activation(x)
        x = nn.Dense(self.channels, **kw)(x)
        if self.shortcut:
            x = self.activation(shortcut + x)
        else:
            x = self.activation(x)
        if self.unit_norm_out:
            x = unit_norm(x, axis=-1)
        return x


class ResidualStack(nn.Module):
    channels: int
    layers: int
    use_bias: bool = True
    shortcut: bool = True
    unit_norm_out: bool = False
    init_scale: float = 0.1
    activation: Callable = _leaky_relu

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers):
            x = ResidualBlock(
                self.channels,
                use_bias=self.use_bias,
                shortcut=self.shortcut,
                unit_norm_out=self.unit_norm_out,
                init_scale=self.init_scale,
                activation=self.activation,
            )(x)
        return x


class LinearOutputStack(nn.Module):
    """[optional in-proj] -> residual stack -> out-proj (reference
    ``linear.py:77-110``; note the reference drops the bias when
    out_channels == 1)."""

    channels: int
    layers: int
    out_channels: Optional[int] = None
    in_channels: Optional[int] = None
    use_bias: bool = True
    shortcut: bool = True
    unit_norm_out: bool = False
    init_scale: float = 0.1
    activation: Callable = _leaky_relu

    @nn.compact
    def __call__(self, x):
        out_channels = self.out_channels or self.channels
        kw = dict(
            kernel_init=uniform_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )
        if self.in_channels is not None:
            x = nn.Dense(self.channels, use_bias=self.use_bias, **kw)(x)
        x = ResidualStack(
            self.channels,
            self.layers,
            use_bias=self.use_bias,
            shortcut=self.shortcut,
            unit_norm_out=self.unit_norm_out,
            init_scale=self.init_scale,
            activation=self.activation,
        )(x)
        x = nn.Dense(out_channels, use_bias=out_channels > 1, **kw)(x)
        return x
