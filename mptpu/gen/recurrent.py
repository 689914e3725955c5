"""Recurrent frame synthesizer (reference ``modules/recurrent.py:19-101``):
per-frame noise-band + oscillator synthesis driven by a latent evolved by a
gated recurrence, until a stop gate fires (fixed max iterations here —
data-dependent early exit doesn't jit; the reference's gate weighting is
preserved)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.norms import unit_norm
from ..ops.upsample import interpolate_last_axis
from ..nn.linear import LinearOutputStack
from .ddsp import noise_bank2


class FrameSynth(nn.Module):
    """(batch, time, channels) latents -> audio (reference ``Synth``,
    ``recurrent.py:19-58``)."""

    layers: int
    channels: int
    samples_per_frame: int
    n_osc: int = 64

    @nn.compact
    def __call__(self, x, key):
        batch, time, channels = x.shape
        n_coeffs = self.samples_per_frame + 1

        noise_params = LinearOutputStack(
            self.channels, self.layers, out_channels=n_coeffs
        )(x)
        noise = noise_bank2(key, jnp.swapaxes(noise_params, 1, 2))

        osc = LinearOutputStack(
            self.channels, self.layers, out_channels=2 * self.n_osc
        )(x).reshape(batch, time, self.n_osc, 2)
        amp = jnp.swapaxes(jnp.linalg.norm(osc, axis=-1), 1, 2)
        freq = jnp.swapaxes(
            jnp.arctan2(osc[..., 1], osc[..., 0]) / jnp.pi, 1, 2
        )
        freq = freq * 0.98 + 0.0036

        total = self.samples_per_frame * time
        amp = interpolate_last_axis(amp, total)
        freq = interpolate_last_axis(freq, total)
        sig = jnp.sin(jnp.cumsum(freq * jnp.pi, axis=-1)) * amp
        sig = jnp.sum(sig, axis=1, keepdims=True)
        return sig + noise


class RecurrentSynth(nn.Module):
    """Latent -> gated recurrence over frames -> synth (reference
    ``RecurrentSynth``, ``recurrent.py:61-101``)."""

    layers: int
    channels: int
    samples_per_frame: int
    max_iter: int = 10

    @nn.compact
    def __call__(self, x, key):
        x = unit_norm(x)
        net = LinearOutputStack(self.channels, self.layers)
        gate = LinearOutputStack(self.channels, self.layers, out_channels=2)

        latents = []
        amps = []
        h = x
        for _ in range(self.max_iter):
            h = net(h)
            g = jax.nn.softmax(gate(h), axis=-1)
            # gate[0] = keep-going weight applied to the emitted frame
            amps.append(g[..., 0:1])
            latents.append(h)
            h = unit_norm(h)

        seq = jnp.stack(latents, axis=1).reshape(
            x.shape[0], self.max_iter, self.channels
        )
        amp = jnp.stack(amps, axis=1).reshape(x.shape[0], self.max_iter, 1)
        audio = FrameSynth(
            self.layers, self.channels, self.samples_per_frame
        )(seq * amp, key)
        return audio
