"""Functional song representation: a neural function from absolute song
position to audio, decoded through stacked damped-harmonic-oscillator
banks (reference ``funcsong.py:40-199``).

The network maps a sinusoidal position encoding of an absolute sample
range to per-resonance energy envelopes; three oscillator banks then
materialize audio, each later bank's tension modulated by the previous
bank's output (reference ``funcsong.py:103-135``). The whole decode is
one fused XLA expression (closed-form oscillators, no recurrence), so
the MXU sees only the MLP matmuls and everything else fuses into
elementwise code.

Design deviation (documented): the reference modulates tension with
``tension_modifier[0]`` — batch item 0's output for every item
(``funcsong.py:84``); here the modulation is batch-correct.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.init import uniform_range_init


class DampedOscillatorBank(nn.Module):
    """One bank of closed-form oscillators (reference ``funcsong.py:40-100``).

    Note the reference's funcsong oscillator has NO exponential decay
    term (``funcsong.py:203-222``: ``z = a * energy * cos(omega t -
    phi)``) — "damping" only detunes ``omega`` and shifts ``phi``; the
    time-varying ``energy`` envelope supplies the actual decay. Mirrored
    exactly here.
    """

    n_samples: int
    n_oscillators: int
    n_resonances: int
    expressivity: int

    def setup(self):
        shape = (1, self.n_oscillators, self.n_resonances, self.expressivity)
        self.damping = self.param("damping", uniform_range_init(0.5, 1.5), shape)
        self.mass = self.param("mass", uniform_range_init(-2.0, 2.0), shape)
        self.tension = self.param("tension", uniform_range_init(4.0, 9.0), shape)
        self.initial_displacement = self.param(
            "initial_displacement", uniform_range_init(-1.0, 2.0), shape
        )
        self.amplitudes = self.param(
            "amplitudes", uniform_range_init(-1.0, 1.0), shape + (1,)
        )

    def __call__(self, energy, tension_modifier=None, scaling=None):
        """energy: (batch, 1, n_resonances, 1, n_samples) -> (batch, 1,
        n_resonances, expressivity, n_samples)."""
        time = jnp.linspace(0.0, 10.0, self.n_samples).reshape(1, 1, 1, 1, -1)
        t = self.tension[..., None]
        if tension_modifier is not None:
            # (batch, 1, res, expr, time) * (osc, res, expr, 1)
            t = t + tension_modifier * scaling
        mass = jax.nn.sigmoid(self.mass[..., None]) * 2.0
        damping = jax.nn.sigmoid(self.damping[..., None]) * 30.0
        d0 = self.initial_displacement[..., None]
        x = damping / (2.0 * mass)
        omega = jnp.sqrt(jnp.abs(10.0**t - x**2))
        phi = jnp.arctan2(x * d0, d0 * omega)
        a = d0 / jnp.cos(phi)
        z = a * energy * jnp.cos(omega * time - phi)
        z = z * self.amplitudes
        z = jnp.sum(z, axis=1, keepdims=True)  # sum oscillators
        return z


class OscillatorStack(nn.Module):
    """Three chained banks with learned inter-bank tension influence and
    a softmax mix (reference ``funcsong.py:103-135``)."""

    n_samples: int
    n_oscillators: int
    n_resonances: int
    expressivity: int

    def setup(self):
        kw = dict(
            n_samples=self.n_samples,
            n_oscillators=self.n_oscillators,
            n_resonances=self.n_resonances,
            expressivity=self.expressivity,
        )
        self.dho1 = DampedOscillatorBank(**kw)
        self.dho2 = DampedOscillatorBank(**kw)
        self.dho3 = DampedOscillatorBank(**kw)
        ishape = (self.n_oscillators, self.n_resonances, self.expressivity, 1)
        self.influence = self.param("influence", uniform_range_init(-0.01, 0.01), ishape)
        self.influence2 = self.param("influence2", uniform_range_init(-0.01, 0.01), ishape)
        self.mix = self.param(
            "mix",
            uniform_range_init(-1.0, 1.0),
            (1, 1, self.n_resonances, self.expressivity, 1, 3),
        )

    def __call__(self, energy):
        x1 = self.dho1(energy)
        x2 = self.dho2(energy, x1, self.influence)
        x3 = self.dho3(energy, x2, self.influence2)
        outputs = jnp.stack([x1, x2, x3], axis=-1)
        return jnp.sum(outputs * jax.nn.softmax(self.mix, axis=-1), axis=-1)


class ResidualSeluLayer(nn.Module):
    """selu(Dense(x)) + x (reference ``funcsong.py:137-152``; the
    reference wraps the linear in weight_norm — plain Dense here, the
    stft loss landscape does not need the reparameterization)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        return x + jax.nn.selu(nn.Dense(self.channels)(x))


class FuncSong(nn.Module):
    """Position encoding -> MLP -> per-resonance energy -> oscillator
    stack -> mono audio (reference ``funcsong.py:155-199``)."""

    segment_size: int
    in_channels: int
    hidden_channels: int
    n_layers: int
    n_resonances: int = 64

    @nn.compact
    def __call__(self, pos):
        """pos: (batch, in_channels, segment) -> (batch, 1, segment)."""
        batch = pos.shape[0]
        x = jnp.swapaxes(pos, 1, 2)  # (batch, time, channels)
        x = nn.Dense(self.hidden_channels)(x)
        for _ in range(self.n_layers):
            x = ResidualSeluLayer(self.hidden_channels)(x)
        e = jnp.abs(nn.Dense(self.n_resonances)(x))  # (batch, time, res)
        e = jnp.transpose(e, (0, 2, 1)).reshape(
            batch, 1, self.n_resonances, 1, self.segment_size
        )
        d = OscillatorStack(
            n_samples=self.segment_size,
            n_oscillators=2,
            n_resonances=self.n_resonances,
            expressivity=1,
        )(e)
        d = d.reshape(batch, self.n_resonances, self.segment_size)
        return jnp.sum(d, axis=1, keepdims=True)


def song_pos_encoding(
    start_sample: jax.Array,
    n_segment_samples: int,
    total_samples: int,
    n_channels: int,
) -> jax.Array:
    """Absolute-position sin/cos features for one crop (reference
    ``funcsong.py:232-251``): frequencies span [1, total//2] cycles per
    song, evaluated over the crop's absolute phase range. ``start_sample``
    may be traced, so crops resample without recompiling.

    Returns (n_channels, n_segment_samples)."""
    factor = 2.0 * jnp.pi
    start = start_sample / total_samples
    end = (start_sample + n_segment_samples) / total_samples
    t = (
        start * factor
        + (end - start)
        * factor
        * jnp.linspace(0.0, 1.0, n_segment_samples)
    )[None, :]
    freqs = jnp.linspace(1.0, total_samples // 2, n_channels // 2)[:, None]
    return jnp.concatenate([jnp.sin(t * freqs), jnp.cos(t * freqs)], axis=0)


def count_parameters(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
