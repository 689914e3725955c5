"""Multi-resolution multiband spectrogram features (reference
``modules/multibanddict.py:19-49`` and ``modules/infoloss.py:16-24``)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.decompose import fft_frequency_decompose
from ..ops.stft import stft


def stft_transform(
    x: jax.Array,
    transform_window_size: int = 2048,
    transform_step_size: int = 256,
) -> jax.Array:
    """STFT magnitude reshaped to (batch, coeffs-1, frames) (reference
    ``infoloss.py:16-24``)."""
    batch_size = x.shape[0]
    s = stft(x, transform_window_size, transform_step_size, pad=True)
    n_coeffs = transform_window_size // 2 + 1
    s = s.reshape(batch_size, -1, n_coeffs)[..., : n_coeffs - 1]
    return jnp.transpose(s, (0, 2, 1))


def multiband_spectrogram(
    x: jax.Array,
    stft_spec: Dict[str, Tuple[int, int]],
    smallest_band_size: int = 512,
    normalize: bool = False,
) -> Dict[str, jax.Array]:
    """Octave decomposition, then an STFT per (band, resolution) pair —
    keys are ``f"{band_size}_{name}"`` (reference
    ``multibanddict.py:19-38``)."""
    bands = fft_frequency_decompose(x, smallest_band_size)
    accum: Dict[str, jax.Array] = {}
    for name, (ws, step) in stft_spec.items():
        for k, v in bands.items():
            s = stft(v, ws, step, pad=True)
            if normalize:
                s = s / v.size
            accum[f"{k}_{name}"] = s
    return accum


def flattened_multiband_spectrogram(
    x: jax.Array,
    stft_spec: Dict[str, Tuple[int, int]],
    smallest_band_size: int = 512,
    normalize: bool = False,
) -> jax.Array:
    """All (band, resolution) spectrograms flattened and concatenated —
    the standard loss feature (reference ``multibanddict.py:41-49``)."""
    batch_size, channels = x.shape[0], x.shape[1]
    bands = multiband_spectrogram(x, stft_spec, smallest_band_size, normalize)
    return jnp.concatenate(
        [b.reshape(batch_size, channels, -1) for b in bands.values()], axis=-1
    )
