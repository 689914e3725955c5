"""Morlet filter bank — the zounds ``FilterBank`` equivalent used by the
scattering transform and psychoacoustic feature (reference
``modules/stft.py:69-98`` morlet_filter_bank + zounds usages).

scipy removed ``signal.morlet``; the wavelet is built directly:
``pi**-0.25 * exp(1j*w*x) * exp(-x**2/2)`` on ``x = linspace(-s*2pi,
s*2pi, M)``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def morlet(M: int, w: float = 5.0, s: float = 1.0) -> np.ndarray:
    x = np.linspace(-s * 2 * np.pi, s * 2 * np.pi, M)
    return np.pi ** (-0.25) * np.exp(1j * w * x) * np.exp(-(x**2) / 2)


def mel_scale_hz(start_hz: float, stop_hz: float, n_bands: int) -> np.ndarray:
    """Mel-spaced center frequencies (zounds MelScale equivalent)."""

    def to_mel(f):
        return 2595.0 * np.log10(1 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10 ** (m / 2595.0) - 1)

    mels = np.linspace(to_mel(start_hz), to_mel(stop_hz), n_bands)
    return from_mel(mels)


def morlet_filter_bank(
    samplerate: int,
    kernel_size: int,
    center_frequencies_hz: Sequence[float],
    scaling_factor,
    normalize: bool = True,
) -> np.ndarray:
    """(n_bands, kernel_size) real morlet filters (reference
    ``modules/stft.py:69-98``)."""
    freqs = np.asarray(center_frequencies_hz, dtype=np.float64)
    basis_size = len(freqs)
    if np.isscalar(scaling_factor) or np.ndim(scaling_factor) == 0:
        scaling_factor = np.repeat(float(scaling_factor), basis_size)
    basis = np.zeros((basis_size, kernel_size), dtype=np.complex128)
    for i, (freq, scaling) in enumerate(zip(freqs, scaling_factor)):
        w = freq / (scaling * 2 * samplerate / kernel_size)
        basis[i] = morlet(M=kernel_size, w=w, s=scaling)
    if normalize:
        basis /= np.linalg.norm(basis, axis=-1, keepdims=True) + 1e-8
    return basis


def filter_bank_convolve(
    x: jax.Array, filters: jnp.ndarray, padding: int | None = None
) -> jax.Array:
    """Conv1d with a (n_filters, taps) real bank, same-ish padding,
    trimmed to the input length (the zounds FilterBank.convolve analog)."""
    n_samples = x.shape[-1]
    n_filters, taps = filters.shape
    pad = padding if padding is not None else taps // 2
    out = lax.conv_general_dilated(
        x.reshape(x.shape[0], 1, n_samples),
        filters[:, None, :],
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[..., :n_samples]


def avg_pool_1d(
    x: jax.Array, kernel: int, stride: int, padding: int
) -> jax.Array:
    """torch-style F.avg_pool1d (count_include_pad=True)."""
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1,) * (x.ndim - 1) + (kernel,),
        window_strides=(1,) * (x.ndim - 1) + (stride,),
        padding=[(0, 0)] * (x.ndim - 1) + [(padding, padding)],
    )
    return summed / kernel
