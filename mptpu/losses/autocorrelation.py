"""Spiking-style perceptual losses: autocorrelation features over a
rectified gammatone filterbank, and a decay-template envelope loss
(reference ``spiking.py:129-180`` ``DecayLoss``, ``spiking.py:354-434``
``AutocorrelationLoss``).

TPU design: the filterbank convolution and the decay-template smear are
batched rFFT products; the windowing is a strided reshape; everything is
jit-friendly with static shapes (no unfold object, no module state —
filters are closed-over constants).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fft import fft_convolve
from ..ops.stft import stft
from ..ops.norms import unit_norm
from ..ops.decompose import fft_frequency_decompose
from ..perceptual.gammatone import gammatone_filter_bank


def _frame(x: jax.Array, window: int, step: int) -> jax.Array:
    """(..., n) -> (..., frames, window) half-overlapped frames (the
    reference's ``unfold`` after right-padding by ``step``)."""
    n = x.shape[-1]
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, step)])
    frames = 1 + (n + step - window) // step
    idx = jnp.arange(frames)[:, None] * step + jnp.arange(window)[None, :]
    return x[..., idx]


class AutocorrelationLoss:
    """Gammatone channels -> half-wave rectify -> windowed rFFT ->
    adjacent-bin and adjacent-frame spectral correlations (reference
    ``AutocorrelationLoss.forward``, ``spiking.py:443-481``)."""

    def __init__(self, n_channels: int = 64, filter_size: int = 128):
        self.n_channels = n_channels
        self.filter_size = filter_size
        g = gammatone_filter_bank(
            n_filters=n_channels, size=filter_size, band_spacing="linear"
        )
        self.gammatone = unit_norm(jnp.asarray(g))[None, :, :]

    def features(
        self, audio: jax.Array, window_size: int = 128, step_size: int = 64
    ) -> jax.Array:
        n_samples = audio.shape[-1]
        audio = audio.reshape(-1, 1, n_samples)
        g = jnp.pad(
            self.gammatone, ((0, 0), (0, 0), (0, n_samples - self.filter_size))
        )
        channels = jax.nn.relu(fft_convolve(audio, g))
        frames = _frame(channels, window_size, step_size)
        spec = jnp.fft.rfft(frames, axis=-1)
        corr = jnp.abs(spec[..., 1:] * spec[..., :-1])          # adjacent bins
        corr2 = jnp.abs(spec[:, :, 1:, :] * spec[:, :, :-1, :])  # adjacent frames
        return jnp.concatenate([corr.reshape(-1), corr2.reshape(-1)])

    def loss(
        self,
        target: jax.Array,
        recon: jax.Array,
        window_size: int = 128,
        step_size: int = 64,
    ) -> jax.Array:
        t = self.features(target, window_size, step_size)
        r = self.features(recon, window_size, step_size)
        return jnp.abs(t - r).sum()

    def multiband_loss(
        self,
        target: jax.Array,
        recon: jax.Array,
        window_size: int = 128,
        step_size: int = 64,
        min_size: int = 512,
    ) -> jax.Array:
        tb = fft_frequency_decompose(target, min_size)
        rb = fft_frequency_decompose(recon, min_size)
        loss = 0.0
        for k in tb:
            loss = loss + jnp.abs(
                self.features(tb[k], window_size, step_size)
                - self.features(rb[k], window_size, step_size)
            ).sum()
        return loss

    __call__ = loss


class DecayLoss:
    """Spectrogram frames smeared with a bank of decay templates, minus a
    trailing moving average, rectified (reference ``DecayLoss``,
    ``spiking.py:129-180``) — penalizes envelopes that do not decay."""

    def __init__(
        self,
        n_samples: int,
        n_decays: int = 16,
        min_decay: float = 0.5,
        max_decay: float = 32.0,
        window_size: int = 512,
        pool: int = 16,
    ):
        self.n_samples = n_samples
        self.window_size = window_size
        self.step_size = window_size // 2
        self.n_frames = n_samples // self.step_size
        self.pool = pool
        base = np.linspace(1, 0, self.n_frames)[None, :]
        exps = np.linspace(min_decay, max_decay, n_decays)[:, None]
        decays = base**exps
        decays = decays / (np.linalg.norm(decays, axis=-1, keepdims=True) + 1e-8)
        self.decays = jnp.asarray(decays)[None, None, :, :]  # (1,1,D,F)

    def features(self, x: jax.Array) -> jax.Array:
        batch = x.shape[0]
        spec = stft(x, self.window_size, self.step_size, pad=True)
        spec = jnp.swapaxes(spec, -1, -2)  # (b, c, coeffs, frames)
        smeared = fft_convolve(
            spec[:, :, :, None, :], self.decays[:, :, None, :, :]
        )
        smeared = smeared.reshape(batch, -1, self.n_frames)
        # trailing moving average (left-padded avg pool, stride 1):
        # pooled[i] = mean(smeared[i-k .. i-1]) — the window EXCLUDES the
        # current frame, matching F.avg_pool1d(F.pad(x, [k, 0]), k, 1)
        # (reference spiking.py:160-161)
        k = self.pool
        padded = jnp.pad(smeared, ((0, 0), (0, 0), (k, 0)))
        csum = jnp.cumsum(padded, axis=-1)
        csum = jnp.pad(csum, ((0, 0), (0, 0), (1, 0)))  # csum[j] = sum of first j
        pooled = (csum[..., k:] - csum[..., :-k]) / k
        pooled = pooled[..., : self.n_frames]
        return jax.nn.relu(smeared - pooled)

    def loss(self, target: jax.Array, recon: jax.Array) -> jax.Array:
        return jnp.abs(self.features(target) - self.features(recon)).sum()

    __call__ = loss
