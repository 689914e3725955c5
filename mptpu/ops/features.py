"""Small audio feature ops: amplitude envelope, MFCC, chroma (reference
``modules/envelope.py:4``, ``modules/audio_features.py:6-41``)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def amplitude_envelope(audio: jax.Array, n_frames: int) -> jax.Array:
    """Pooled |audio| at frame rate (reference ``envelope.py:4-9``)."""
    batch, channels, time = audio.shape
    step = time // n_frames
    window = step * 2
    summed = lax.reduce_window(
        jnp.abs(audio),
        0.0,
        lax.add,
        window_dimensions=(1, 1, window),
        window_strides=(1, 1, step),
        padding=((0, 0), (0, 0), (step, step)),
    )
    return summed / window


def mfcc(x: jax.Array, n_coeffs: int = 12) -> jax.Array:
    """Cepstral coefficients of a (batch, freq_bins, time) spectrogram
    (reference ``audio_features.py:11-18``)."""
    n = x.shape[1]
    cepstrum = jnp.fft.rfft(x, axis=1) * (1.0 / np.sqrt(n))
    mag = jnp.log(jnp.abs(cepstrum) + 1e-12)
    return mag[:, 1 : n_coeffs + 1, :]


def chroma(x: jax.Array, basis: jnp.ndarray) -> jax.Array:
    """Project spectrogram bins onto a chroma basis (reference
    ``audio_features.py:26-37``)."""
    out = jnp.transpose(x, (0, 2, 1)) @ basis.T
    return jnp.transpose(out, (0, 2, 1))


def chroma_basis(n_bins: int, samplerate: int = 22050, start_hz: float = 20.0):
    """12-class chroma basis over geometrically spaced bins (the zounds
    ChromaScale analog used by ``psychoacoustic.chroma_basis``)."""
    freqs = np.geomspace(start_hz, samplerate / 2 - 10, n_bins)
    midi = 69 + 12 * np.log2(freqs / 440.0)
    classes = np.round(midi).astype(int) % 12
    basis = np.zeros((12, n_bins), dtype=np.float32)
    basis[classes, np.arange(n_bins)] = 1.0
    basis /= basis.sum(axis=-1, keepdims=True) + 1e-8
    return basis
