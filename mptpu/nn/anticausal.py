"""Anti-causal (future-looking) gated dilated conv stack — the SIAM
encoder (reference ``modules/anticausal.py:10-144``).

Data layout is channels-last ((batch, time, channels)) internally — the
TPU-friendly layout for ``lax.conv`` — with (batch, channels, time) at the
public boundary to match the reference's call shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import uniform_init
from .pos_encode import pos_encoded


class AntiCausalConv(nn.Module):
    """Dilated conv padded on the *right* so each step sees the future
    (reference ``anticausal.py:10-25``); ``reverse_causality`` pads left."""

    out_channels: int
    kernel_size: int
    dilation: int
    reverse_causality: bool = False
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x):  # (batch, time, channels)
        pad = (self.kernel_size * self.dilation) // 2
        padding = [(pad, 0)] if self.reverse_causality else [(0, pad)]
        return nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=padding,
            kernel_init=uniform_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )(x)


class AntiCausalBlock(nn.Module):
    """Gated residual block: conv * selu(gate) + skip (reference
    ``anticausal.py:28-66``).

    ``activation_clamp`` > 0 clips each block's output to +/- that bound
    with a straight-through identity backward. The selu-gated product is
    QUADRATIC in x, so an N-block stack is a degree-2^N polynomial of its
    input — capable of overflowing f32 in a single forward once weights
    grow (the round-3 SIAM NaN post-mortem, BENCHMARKS.md). The clamp is
    forward-identical while activations stay within the bound (healthy
    runs sit orders of magnitude below it) and makes overflow impossible.
    0 = exact reference semantics."""

    channels: int
    kernel_size: int
    dilation: int
    do_norm: bool = False
    reverse_causality: bool = False
    with_activation_norm: bool = False
    init_scale: float = 0.1
    activation_clamp: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        conv = AntiCausalConv(
            self.channels, self.kernel_size, self.dilation,
            self.reverse_causality, self.init_scale,
        )(x)
        gate = AntiCausalConv(
            self.channels, self.kernel_size, self.dilation,
            self.reverse_causality, self.init_scale,
        )(x)
        if self.with_activation_norm:
            tw = self.param("tanh_weight", nn.initializers.constant(0.5), (1,))
            sw = self.param("sigmoid_weight", nn.initializers.constant(0.5), (1,))
            x = jnp.tanh(conv * tw) * jax.nn.sigmoid(gate * sw)
        else:
            x = conv * jax.nn.selu(gate)
        x = x + skip
        if self.activation_clamp:
            from ..ops.ste import straight_through

            b = self.activation_clamp
            x = straight_through(jnp.clip(x, -b, b), x)
        if self.do_norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        return x


class AntiCausalStack(nn.Module):
    """Sum of all blocks' outputs -> 1x1 conv (reference
    ``anticausal.py:69-96``)."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    do_norm: bool = False
    reverse_causality: bool = False
    with_activation_norm: bool = False
    init_scale: float = 0.1
    activation_clamp: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        output = jnp.zeros_like(x)
        for d in self.dilations:
            x = AntiCausalBlock(
                self.channels,
                self.kernel_size,
                d,
                do_norm=self.do_norm,
                reverse_causality=self.reverse_causality,
                with_activation_norm=self.with_activation_norm,
                init_scale=self.init_scale,
                activation_clamp=self.activation_clamp,
            )(x, train=train)
            output = output + x
        return nn.Dense(
            self.channels,
            kernel_init=uniform_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )(output)


class AntiCausalAnalysis(nn.Module):
    """Project spectrogram channels to model channels, then the stack
    (reference ``anticausal.py:99-144``).

    Public call shape: (batch, in_channels, time) -> (batch, channels, time).
    """

    in_channels: int
    channels: int
    kernel_size: int
    dilations: Sequence[int]
    do_norm: bool = False
    pos_encodings: bool = False
    reverse_causality: bool = False
    with_activation_norm: bool = False
    init_scale: float = 0.1
    activation_clamp: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        batch, channels, time = x.shape
        x = jnp.transpose(x, (0, 2, 1))  # -> (batch, time, channels)
        x = nn.Dense(
            self.channels,
            kernel_init=uniform_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )(x)
        if self.pos_encodings:
            p = pos_encoded(batch, time, n_freqs=16)
            p = nn.Dense(
                self.channels,
                kernel_init=uniform_init(self.init_scale),
                bias_init=nn.initializers.zeros,
            )(p)
            x = x + p
        x = AntiCausalStack(
            self.channels,
            self.kernel_size,
            self.dilations,
            do_norm=self.do_norm,
            reverse_causality=self.reverse_causality,
            with_activation_norm=self.with_activation_norm,
            init_scale=self.init_scale,
            activation_clamp=self.activation_clamp,
        )(x, train=train)
        return jnp.transpose(x, (0, 2, 1))
