"""FFT-based phase-invariant feature (reference ``modules/pif.py:7-37``):
window the *spectrum* into channels, back to time, rectify + sqrt-compress,
then windowed rFFT magnitudes per channel."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import _frame
from ..ops.windows import hamming_window


def fft_based_pif(
    audio: jax.Array, freq_window_size: int, time_window_size: int
) -> jax.Array:
    batch_size = audio.shape[0]
    spec = jnp.fft.rfft(audio, axis=-1)
    freq_step = freq_window_size // 2

    windowed = _frame(spec, freq_window_size, freq_step)
    windowed = windowed * hamming_window(
        freq_window_size, dtype=jnp.float32
    )
    channels = jnp.fft.irfft(windowed, axis=-1)
    n_channels = channels.shape[2]

    channels = jax.nn.relu(channels)
    channels = jnp.sqrt(channels)

    step = time_window_size // 2
    channels = channels.reshape(batch_size, n_channels, -1)
    channels = _frame(channels, time_window_size, step)
    channels = channels * hamming_window(
        channels.shape[-1], dtype=channels.dtype
    )
    return jnp.abs(jnp.fft.rfft(channels, axis=-1))
