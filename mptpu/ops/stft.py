"""Short-time Fourier transform.

Parity with reference ``modules/stft.py:7-66`` (unfold + Hann + ortho rFFT;
magnitude / log-magnitude / complex-as-real variants), built from static
strided frame extraction so the whole pipeline stays one fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from .fft import rfft as _rfft

from .windows import hann_window


def _frame(x: jax.Array, ws: int, step: int) -> jax.Array:
    """Extract overlapping frames along the last axis (torch ``unfold``)."""
    n = x.shape[-1]
    n_frames = (n - ws) // step + 1
    starts = jnp.arange(n_frames) * step
    idx = starts[:, None] + jnp.arange(ws)[None, :]
    return x[..., idx]  # (..., n_frames, ws)


def stft(
    x: jax.Array,
    ws: int = 512,
    step: int = 256,
    pad: bool = False,
    log_amplitude: bool = False,
    log_epsilon: float = 1e-4,
    return_complex: bool = False,
    mag_epsilon: float = 0.0,
) -> jax.Array:
    """(batch, channels, time) -> (batch, channels, frames, coeffs).

    ``frames = time // step`` (the reference's convention,
    ``modules/stft.py:16``); with ``pad=True`` the signal is right-padded by
    ``ws`` first so all those frames exist.
    """
    frames = x.shape[-1] // step
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, ws)])
    framed = _frame(x, ws, step)
    win = hann_window(ws, periodic=True, dtype=framed.dtype)
    framed = framed * win
    spec = _rfft(framed, axis=-1, norm="ortho")
    if return_complex:
        out = jnp.stack([spec.real, spec.imag], axis=-1)
        return out[..., :frames, :, :]
    if mag_epsilon:
        # |z| has a dead (0/0) gradient at exactly zero — fatal for
        # energy-matching losses when a generator collapses to silence;
        # the smoothed magnitude keeps a pull-back-up gradient alive
        mag = jnp.sqrt(spec.real**2 + spec.imag**2 + mag_epsilon**2)
    else:
        mag = jnp.abs(spec)
    if log_amplitude:
        mag = jnp.log(mag + log_epsilon)
    return mag[..., :frames, :]


def log_stft(x: jax.Array, ws: int = 512, step: int = 256, a: float = 0.001) -> jax.Array:
    return jnp.log(a + stft(x, ws, step))


def stft_relative_phase(
    x: jax.Array, ws: int = 512, step: int = 256, pad: bool = False
):
    """Magnitude + instantaneous-frequency phase (reference ``stft.py:39-61``)."""
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, step)])
    framed = _frame(x, ws, step)
    win = hann_window(ws, periodic=True, dtype=framed.dtype)
    spec = _rfft(framed * win, axis=-1, norm="ortho")
    spec = spec.reshape(spec.shape[0], -1, ws // 2 + 1)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    phase = jnp.diff(
        phase, axis=-1, prepend=jnp.zeros(phase.shape[:-1] + (1,), phase.dtype)
    )
    return mag, phase


def short_time_transform(
    x: jax.Array, basis: jax.Array, pad: bool = True
) -> jax.Array:
    """Windowed projection onto an arbitrary (n_filters, window) basis,
    keeping the first window//2+1 outputs (reference
    ``modules/stft.py:101-116``)."""
    from .windows import hamming_window

    ws = basis.shape[1]
    ss = ws // 2
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, ss)])
    framed = _frame(x, ws, ss)
    framed = framed * hamming_window(ws, dtype=framed.dtype)
    freq_domain = framed @ basis.T
    return freq_domain[..., : ws // 2 + 1]
