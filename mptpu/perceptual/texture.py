"""Audio-texture statistics: per-band gammatone envelope autocorrelation
and kurtosis (reference ``texture.py:18-83`` — McDermott/Simoncelli-style
texture features used to synthesize audio by matching statistics).

TPU design: the per-band python loop of the reference is over the STATIC
octave-band dict (one jitted program covers all bands), the filter-bank
convolution is a batched rFFT product, and kurtosis is a closed-form
moment ratio — no unfold, no module state.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fft import fft_convolve
from ..ops.decompose import fft_frequency_decompose
from ..ops.norms import unit_norm
from ..ops.upsample import ensure_last_axis_length
from .gammatone import gammatone_filter_bank


def calculate_kurtosis(x: jax.Array, axis: int = -1) -> jax.Array:
    """Excess kurtosis along ``axis`` (reference ``texture.py:18-24``)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    # torch.std defaults to the UNBIASED (n-1) estimator — match it
    n = x.shape[axis]
    var = jnp.sum((x - mean) ** 2, axis=axis, keepdims=True) / max(n - 1, 1)
    fourth = jnp.mean((x - mean) ** 4, axis=axis, keepdims=True)
    return fourth / (var**2 + 1e-12) - 3.0


class AudioTextureFeatures:
    """Texture statistics of (batch, 1, n_samples) audio (reference
    ``AudioFeatures``, ``texture.py:27-83``): octave-band decompose ->
    gammatone filter-bank envelope -> per-band forward/backward spectral
    autocorrelations (within-band and neighboring-band) + envelope
    kurtosis + envelope-difference kurtosis, all flattened."""

    def __init__(
        self,
        n_samples: int,
        n_filters: int = 64,
        filter_size: int = 64,
        samplerate: int = 22050,
        min_band_size: int = 512,
    ):
        self.n_samples = n_samples
        self.n_filters = n_filters
        self.filter_size = filter_size
        self.min_band_size = min(min_band_size, n_samples)
        fb = gammatone_filter_bank(
            n_filters,
            filter_size,
            start_hz=20,
            stop_hz=samplerate // 2 - 10,
            samplerate=samplerate,
            band_spacing="linear",
        )
        self.fb = unit_norm(jnp.asarray(fb))

    def __call__(self, audio: jax.Array) -> jax.Array:
        batch = audio.shape[0]
        audio = audio.reshape(-1, 1, self.n_samples)
        bands = fft_frequency_decompose(audio, self.min_band_size)
        results = []
        for size, band in bands.items():
            fb = self.fb.reshape(1, self.n_filters, self.filter_size)
            fb = ensure_last_axis_length(fb, size)

            # envelope (power) of each gammatone channel
            spec = fft_convolve(fb, band) ** 2

            reverse = jnp.flip(spec, axis=-1)
            fwd = jnp.abs(jnp.fft.rfft(spec, axis=-1))
            bwd = jnp.abs(jnp.fft.rfft(reverse, axis=-1))

            corr_1 = fwd * bwd                       # within band
            corr_2 = fwd[:, 1:, :] * bwd[:, :-1, :]  # neighboring band

            results.append(
                jnp.concatenate(
                    [
                        corr_1.reshape(batch, -1),
                        corr_2.reshape(batch, -1),
                        calculate_kurtosis(spec).reshape(batch, -1),
                        calculate_kurtosis(
                            spec[:, 1:, :] - spec[:, :-1, :]
                        ).reshape(batch, -1),
                    ],
                    axis=-1,
                )
            )
        return jnp.concatenate(results, axis=-1)

    def loss(self, target: jax.Array, recon: jax.Array) -> jax.Array:
        return jnp.abs(self(recon) - self(target)).sum()
