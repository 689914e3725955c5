"""Multiband psychoacoustic feature (reference
``modules/psychoacoustic.py:15-200``): octave band decomposition, a
mel-spaced morlet bank per band (each at the band's native rate), windowed
rFFT periodicity per channel, and an MSE loss over the feature dicts."""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.decompose import fft_frequency_decompose
from ..ops.stft import _frame
from .filterbank import (
    morlet_filter_bank,
    mel_scale_hz,
    filter_bank_convolve,
    avg_pool_1d,
)

_SPANS = [
    (20, 344),
    (344, 689),
    (689, 1378),
    (1378, 2756),
    (2756, 5512),
    (5512, 11025),
]
_KEYS = [512, 1024, 2048, 4096, 8192, 16384]


class PsychoacousticFeature:
    def __init__(self, kernel_sizes=(32, 64, 128, 256, 512, 1024), n_bands: int = 64):
        self.banks: Dict[int, jnp.ndarray] = {}
        self.kernel_sizes: Dict[int, int] = {}
        for span, size, key in zip(_SPANS, kernel_sizes, _KEYS):
            self.kernel_sizes[key] = size // 2 + 1
            freqs = mel_scale_hz(span[0], span[1], n_bands)
            sr = span[1] * 2
            bank = morlet_filter_bank(
                sr, size, freqs, np.geomspace(0.25, 0.9, num=n_bands)
            ).real.astype(np.float32)
            self.banks[key] = jnp.asarray(bank)

    @property
    def band_sizes(self):
        return sorted(self.banks.keys())

    def decompose(self, x: jax.Array) -> Dict[int, jax.Array]:
        return fft_frequency_decompose(x, 512)

    def _to_dict(self, x):
        if isinstance(x, dict):
            return x
        batch = x.shape[0]
        return self.decompose(x.reshape(batch, 1, -1))

    def compute_feature_dict(
        self, x, constant_window_size=None, time_steps: int = 32
    ) -> Dict[int, jax.Array]:
        """Per-band rectified filterbank -> windowed rFFT magnitudes
        (reference ``psychoacoustic.py:148-185``)."""
        x = self._to_dict(x)
        bands = {}
        for size, bank in self.banks.items():
            band = x[size]
            kernel_size = bank.shape[-1]
            spec = jnp.abs(
                filter_bank_convolve(band.reshape(band.shape[0], -1), bank)
            )
            if constant_window_size is None:
                padding = kernel_size // 4
                window_size = kernel_size
                step = kernel_size // 2
            else:
                window_size = constant_window_size
                padding = window_size // 2
                step = spec.shape[-1] // time_steps
            spec = jnp.pad(spec, ((0, 0), (0, 0), (padding, padding)))
            framed = _frame(spec, window_size, step)
            feat = jnp.abs(jnp.fft.rfft(framed, axis=-1))
            bands[size] = feat[:, :, :time_steps, :]
        return bands

    def loss(self, a, b) -> jax.Array:
        fa = self.compute_feature_dict(a)
        fb = self.compute_feature_dict(b)
        total = 0.0
        for key in fa:
            total = total + jnp.mean((fa[key] - fb[key]) ** 2)
        return total

    def __call__(self, x):
        feats = self.compute_feature_dict(x)
        batch = list(feats.values())[0].shape[0]
        return jnp.concatenate(
            [v.reshape(batch, -1) for v in feats.values()], axis=-1
        )
