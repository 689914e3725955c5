"""Auditory image model: rectified filterbank -> windowed rFFT periodicity
(reference ``modules/aim.py:6-48`` and ``modules/pif.py:41-117``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..ops.fft import rfft as _rfft

from ..ops.fft import fft_convolve
from ..ops.stft import _frame
from ..ops.windows import hamming_window
from ..ops.norms import unit_norm


def rectified_filter_bank(
    signal: jax.Array,
    filters: jax.Array,
    do_log_compression: bool = False,
) -> jax.Array:
    """FFT-convolve with a (n_filters, n_taps) bank, half-wave rectify
    (reference ``aim.py:6-25``)."""
    n_samples = signal.shape[-1]
    n_filters, n_taps = filters.shape
    padded = jnp.pad(filters, ((0, 0), (0, n_samples - n_taps)))[None, :, :]
    spec = fft_convolve(signal, padded)
    spec = jax.nn.relu(spec)
    if do_log_compression:
        spec = jnp.log(spec + 1e-8)
    return spec


def auditory_image_model(
    signal: jax.Array,
    filters: jax.Array,
    aim_window_size: int,
    aim_step_size: int,
) -> jax.Array:
    """(batch, 1, time) -> (batch, n_filters, frames, periodicities)
    (reference ``aim.py:28-48``)."""
    spec = rectified_filter_bank(signal, filters)
    framed = _frame(spec, aim_window_size, aim_step_size)
    return jnp.abs(jnp.fft.rfft(framed, axis=-1))


def auditory_image(
    x: jax.Array,
    window_size: int,
    time_steps: int,
    do_windowing: bool = True,
    check_cola: bool = True,
    causal: bool = False,
    norm_periodicities: bool = False,
) -> jax.Array:
    """Rectified filterbank output -> (time, frequency, periodicity) image
    (functional form of reference ``AuditoryImage``, ``pif.py:41-117``)."""
    batch, channels, time = x.shape
    padding = window_size // 2
    pad = (padding, 0) if causal else (0, padding)
    x = jnp.pad(x, ((0, 0), (0, 0), pad))
    step = time // time_steps
    if check_cola and step != window_size // 2:
        raise ValueError(
            f"window and step ({window_size}, {step}) violate COLA"
        )
    framed = _frame(x, window_size, step)
    if do_windowing:
        framed = framed * hamming_window(window_size, dtype=framed.dtype)
    out = jnp.abs(_rfft(framed, axis=-1, norm="ortho"))
    if norm_periodicities:
        out = unit_norm(out, axis=-1)
    return out
