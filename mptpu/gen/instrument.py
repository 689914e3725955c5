"""Instrument layers/stacks (reference ``modules/instrument.py:11-226``):
a control-plane energy signal is decayed, transformed into a mixture of
sinusoidal resonators by a hypernetwork-generated matrix conditioned on a
time-varying "shape", and layered with a learned mix."""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.fft import fft_convolve
from ..ops.upsample import interpolate_last_axis
from .reds import exponential_decay
from .ssm import HyperNetworkLayer


class InstrumentLayer(nn.Module):
    """(reference ``instrument.py:31-168``)"""

    encoding_channels: int
    channels: int
    n_frames: int
    n_samples: int
    shape_channels: int

    def _pos_encoding(self) -> jnp.ndarray:
        freqs = jnp.linspace(0.00001, 0.49, self.encoding_channels)
        t = jnp.linspace(0, self.n_samples, self.n_samples)
        p = jnp.sin(t[None, :] * freqs[:, None] * jnp.pi)
        return p.reshape(1, 1, self.encoding_channels, self.n_samples)

    @nn.compact
    def __call__(self, energy, transforms, decays):
        """energy (b, E, channels, frames); transforms (b, E,
        shape_channels, shape_frames); decays (b, E, 1) -> (audio (b, E,
        n_samples), next_energy (b, E, channels, frames))."""
        batch, n_events, cp, frames = energy.shape

        base_shape = self.param(
            "base_shape", nn.initializers.zeros, (self.shape_channels,)
        )
        deformability = self.param(
            "deformability", nn.initializers.constant(0.1), (1,)
        )

        pos = self._pos_encoding()

        envelopes = exponential_decay(
            decay_values=decays,
            n_atoms=n_events,
            n_frames=frames,
            base_resonance=0.5,
            n_samples=frames,
        ).reshape(batch, n_events, 1, frames)
        envelopes = jnp.broadcast_to(envelopes, energy.shape)

        energy = fft_convolve(energy, envelopes)
        energy = jnp.transpose(energy, (0, 1, 3, 2))  # (b, E, frames, cp)

        transforms = transforms + deformability * base_shape[None, None, :, None]
        transforms = interpolate_last_axis(transforms, self.n_frames)
        transforms = jnp.transpose(
            transforms, (0, 1, 3, 2)
        )  # (b, E, frames, shape)

        flat_shape = transforms.reshape(-1, self.shape_channels)
        w = HyperNetworkLayer(
            self.shape_channels, 64, self.channels, self.encoding_channels,
            name="hyper",
        )(flat_shape)  # (b*E*frames, channels, encoding)
        w_energy = HyperNetworkLayer(
            self.shape_channels, 16, self.channels, self.channels,
            name="energy_hyper",
        )(flat_shape)

        flat_energy = energy.reshape(-1, 1, self.channels)
        transformed = jnp.matmul(flat_energy, w)[:, 0, :]
        transformed = transformed.reshape(
            batch, n_events, self.n_frames, self.encoding_channels
        )
        transformed = jnp.transpose(transformed, (0, 1, 3, 2))
        transformed = interpolate_last_axis(transformed, self.n_samples)

        next_energy = jnp.matmul(flat_energy, w_energy)[:, 0, :]
        next_energy = next_energy.reshape(
            batch, n_events, frames, self.channels
        )
        next_energy = jnp.transpose(next_energy, (0, 1, 3, 2))

        final = pos * jax.nn.relu(transformed)
        final = jnp.sum(final, axis=2)
        return final, next_energy


class InstrumentStack(nn.Module):
    """Chain of instrument layers, mixed (reference
    ``instrument.py:170-226``)."""

    encoding_channels: int
    channels: int
    n_frames: int
    n_samples: int
    shape_channels: int
    n_layers: int

    @nn.compact
    def __call__(self, energy, transforms: List, decays: List, mix):
        batch, n_events = energy.shape[:2]
        outputs = []
        e = energy
        for i in range(self.n_layers):
            audio, e = InstrumentLayer(
                self.encoding_channels,
                self.channels,
                self.n_frames,
                self.n_samples,
                self.shape_channels,
                name=f"layer_{i}",
            )(e, transforms[i], decays[i])
            outputs.append(audio)
        stacked = jnp.stack(outputs, axis=2)  # (b, E, layers, n)
        mx = jax.nn.softmax(mix, axis=-1)
        return jnp.sum(stacked * mx[:, :, :, None], axis=2)
