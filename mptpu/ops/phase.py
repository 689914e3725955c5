"""Invertible STFT + magnitude/instantaneous-frequency codec (reference
``modules/phase.py:13-84``): windowed analysis, OLA synthesis, and the
mag/phase decomposition that makes spectrogram frames phase-agnostic."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .fft import rfft as _rfft, irfft as _irfft, cexp
from .overlap_add import overlap_add
from .stft import _frame
from .windows import hann_window


def windowed_audio(audio_batch: jax.Array, window_size: int, step_size: int):
    """(batch, ..., time) -> (batch, ..., frames, window) Hann windows
    (reference ``phase.py:13-18``)."""
    x = jnp.pad(
        audio_batch, [(0, 0)] * (audio_batch.ndim - 1) + [(0, step_size)]
    )
    framed = _frame(x, window_size, step_size)
    return framed * hann_window(window_size, dtype=framed.dtype)


def stft_complex(audio_batch: jax.Array, window_size: int, step_size: int):
    """Complex ortho STFT, (batch, frames, coeffs) (reference
    ``phase.py:20-29``)."""
    batch = audio_batch.shape[0]
    framed = windowed_audio(audio_batch, window_size, step_size)
    spec = _rfft(framed, axis=-1, norm="ortho")
    return spec.reshape(batch, -1, window_size // 2 + 1)


def istft(spec: jax.Array) -> jax.Array:
    """Inverse of ``stft_complex`` via overlap-add (reference
    ``phase.py:32-35``)."""
    n = 2 * (spec.shape[-1] - 1)
    windowed = _irfft(spec, n=n, axis=-1, norm="ortho")
    return overlap_add(windowed[:, None, :, :], apply_window=False)


def rfft_freqs(window_size: int) -> jnp.ndarray:
    freqs = jnp.fft.rfftfreq(window_size)
    return freqs.at[0].set(1e-12)


def mag_phase_decomposition(spec: jax.Array, freqs: jnp.ndarray) -> jax.Array:
    """Complex frames -> (mag, carrier-removed instantaneous frequency)
    (reference ``phase.py:44-66``)."""
    batch = spec.shape[0]
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    phase = jnp.diff(
        phase,
        axis=1,
        prepend=jnp.zeros((batch, 1, spec.shape[-1]), phase.dtype),
    )
    phase = phase % (2 * jnp.pi)
    phase = phase - freqs[None, None, :] * 2 * jnp.pi
    return jnp.stack([mag, phase], axis=-1)


def mag_phase_recomposition(spec: jax.Array, freqs: jnp.ndarray) -> jax.Array:
    """Inverse of ``mag_phase_decomposition`` (reference
    ``phase.py:68-84``)."""
    real = spec[..., 0]
    phase = spec[..., 1]
    phase = phase + freqs[None, None, :] * 2 * jnp.pi
    imag = jnp.cumsum(phase, axis=1)
    imag = (imag + jnp.pi) % (2 * jnp.pi) - jnp.pi
    return real * cexp(imag)


class AudioCodec:
    """Round-trip audio <-> phase-agnostic spectrogram frames (reference
    ``phase.py:237-260``)."""

    def __init__(self, window_size: int = 1024, step_size: int = 256):
        self.window_size = window_size
        self.step_size = step_size
        self.freqs = rfft_freqs(window_size)

    def to_frequency_domain(self, audio_batch: jax.Array) -> jax.Array:
        spec = stft_complex(audio_batch, self.window_size, self.step_size)
        return mag_phase_decomposition(spec, self.freqs)

    def to_time_domain(self, spec: jax.Array) -> jax.Array:
        complex_spec = mag_phase_recomposition(spec, self.freqs)
        return istft(complex_spec)
