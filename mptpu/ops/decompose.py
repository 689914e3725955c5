"""FFT-domain octave band decomposition / recomposition — the codec's
filterbank.

Parity with reference ``modules/decompose.py:5-82``: an ortho rFFT split
into octave bands (each band inverse-transformed at its own native sample
rate), plus the inverse ``recompose`` that upsamples every band back to the
target rate by zero-padding its spectrum into the right coefficient range.

Band sizes are static python ints, so each band's irfft has a fixed,
XLA-friendly shape; the returned dict is keyed by band length exactly like
the reference so multiband dictionary code ports over unchanged.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from .fft import rfft as _rfft, irfft as _irfft


def band_sizes(n_samples: int, min_size: int) -> List[int]:
    """The static list of band lengths [min_size, 2*min_size, ..., n_samples]."""
    sizes = []
    current = min_size
    while current <= n_samples:
        sizes.append(current)
        current *= 2
    return sizes


def fft_frequency_decompose(x: jax.Array, min_size: int) -> Dict[int, jax.Array]:
    """Split (batch, channels, n_samples) into octave bands.

    Band of size ``s`` contains frequencies (s/4, s/2] of the original
    spectrum (the lowest band keeps everything below its Nyquist), sampled
    at its own rate: reference ``modules/decompose.py:5-33``.
    """
    n_samples = x.shape[-1]
    coeffs = _rfft(x, axis=-1, norm="ortho")
    output: Dict[int, jax.Array] = {}
    for size in band_sizes(n_samples, min_size):
        sl = coeffs[..., : size // 2 + 1]
        if size > min_size:
            n = sl.shape[-1]
            mask = jnp.zeros((n,), dtype=jnp.float32)
            mask = mask.at[size // 4 : size // 2 + 1].set(1.0)
            sl = sl * mask
        recon = _irfft(sl, n=size, axis=-1, norm="ortho")
        output[size] = recon
    return output


def fft_resample(x: jax.Array, desired_size: int, is_lowest_band: bool) -> jax.Array:
    """Resample one band up to ``desired_size`` samples by placing its
    spectrum into the matching coefficient range (reference
    ``modules/decompose.py:36-73``)."""
    coeffs = _rfft(x, axis=-1, norm="ortho")
    n_coeffs = coeffs.shape[-1]
    new_size = desired_size // 2 + 1
    # build the padded spectrum with pad/mask (no complex zeros-allocation:
    # eager complex lax.full is unimplemented on the axon TPU backend)
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, new_size - n_coeffs)]
    if is_lowest_band:
        new_coeffs = jnp.pad(coeffs, pad)
    else:
        mask = jnp.zeros((n_coeffs,), dtype=jnp.float32)
        mask = mask.at[n_coeffs // 2 : n_coeffs].set(1.0)
        new_coeffs = jnp.pad(coeffs * mask, pad)
    return _irfft(new_coeffs, n=desired_size, axis=-1, norm="ortho")


def fft_frequency_recompose(
    d: Dict[int, jax.Array], desired_size: int
) -> jax.Array:
    """Sum every band resampled to ``desired_size`` (reference ``:76-82``)."""
    first_band = min(d.keys())
    out = None
    for size, band in d.items():
        resampled = fft_resample(band, desired_size, size == first_band)
        out = resampled if out is None else out + resampled
    return out
