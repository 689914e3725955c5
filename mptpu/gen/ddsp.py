"""DDSP primitives: filtered-noise banks and oscillator banks (reference
``modules/ddsp.py:20-100`` noise paths, ``OscillatorBank`` ``:188``).

Noise is explicit-key ``jax.random`` (the torch versions draw global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.fft import rfft, irfft
from ..ops.overlap_add import overlap_add
from ..ops.pdf import pdf
from ..ops.stft import _frame
from ..ops.upsample import interpolate_last_axis
from ..ops.windows import hann_window, hamming_window


def noise_spec(key, n_audio_samples: int, ws: int = 512, step: int = 256):
    """STFT of white noise: (frames, coeffs) (reference ``ddsp.py:20-41``)."""
    x = jax.random.uniform(key, (n_audio_samples,), minval=-1.0, maxval=1.0)
    x = jnp.pad(x, (0, step))
    framed = _frame(x, ws, step)
    framed = framed * hamming_window(ws, dtype=framed.dtype)
    return rfft(framed, axis=-1, norm="ortho")


def band_filtered_noise(
    key,
    n_audio_samples: int,
    ws: int = 512,
    step: int = 256,
    mean=0.5,
    std=0.1,
):
    """Gaussian band-pass filtered white noise, per (batch, atom, frame)
    mean/std trajectories in [0,1] of Nyquist (reference
    ``ddsp.py:44-68``)."""
    batch, atoms, seq_len = mean.shape
    frames = n_audio_samples // step
    spec = noise_spec(key, n_audio_samples, ws, step)  # (frames+, coeffs)
    n_coeffs = spec.shape[-1]
    mean = mean * n_coeffs
    std = std * n_coeffs
    grid = jnp.arange(n_coeffs).reshape(1, 1, n_coeffs, 1)
    filt = pdf(grid, mean[:, :, None, :], std[:, :, None, :])
    filt = filt / jnp.max(filt)
    spec = spec.T[None, None, ...] * filt  # (batch, atoms, coeffs, frames)
    spec = spec.reshape(batch, atoms, n_coeffs, frames)
    spec = jnp.transpose(spec, (0, 1, 3, 2))
    windowed = irfft(spec, axis=-1, norm="ortho")
    samples = overlap_add(windowed)
    return samples[..., :n_audio_samples]


def noise_bank2(key, x: jax.Array) -> jax.Array:
    """Frame-wise rFFT filters applied to white noise + OLA — the DDSP
    filtered-noise synthesizer (reference ``ddsp.py:71-100``).

    x: (batch, n_coeffs, frames) filter magnitudes
    returns (batch, 1, frames * (n_coeffs-1))
    """
    batch, magnitudes, samples = x.shape
    window_size = (magnitudes - 1) * 2
    hop_size = window_size // 2
    total_samples = hop_size * samples

    noise = jax.random.uniform(
        key, (batch, total_samples), minval=-1.0, maxval=1.0
    )
    noise = jnp.pad(noise, ((0, 0), (0, hop_size)))
    framed = _frame(noise, window_size, hop_size)
    framed = framed * hann_window(window_size, dtype=framed.dtype)
    noise_coeffs = rfft(framed, axis=-1, norm="ortho")

    filt = jnp.transpose(x, (0, 2, 1))
    filtered = noise_coeffs * filt

    audio = irfft(filtered, n=window_size, axis=-1, norm="ortho")
    audio = overlap_add(audio[:, None, :, :], apply_window=True)
    return audio[..., :total_samples].reshape(batch, 1, -1)


def oscillator_bank(
    f0: jax.Array,
    amplitudes: jax.Array,
    n_samples: int,
    samplerate: int,
    n_harmonics: int = 8,
) -> jax.Array:
    """Additive harmonic oscillator bank: frame-rate f0 in [0,1] of Nyquist
    + per-harmonic amplitudes -> audio (the DDSP ``OscillatorBank``
    capability, reference ``ddsp.py:188-290``, via cumulative phase)."""
    batch = f0.shape[0]
    f0 = interpolate_last_axis(f0, n_samples)            # (batch, n_samples)
    amps = interpolate_last_axis(amplitudes, n_samples)  # (batch, H, n_samples)
    nyquist = samplerate / 2
    freqs = f0[:, None, :] * (jnp.arange(1, n_harmonics + 1)[None, :, None])
    # silence harmonics above nyquist
    mask = (freqs * nyquist < nyquist).astype(f0.dtype)
    phase = jnp.cumsum(freqs * jnp.pi, axis=-1)
    sig = jnp.sin(phase) * amps * mask
    return jnp.sum(sig, axis=1, keepdims=True)


def harmonic_model(
    f0: jax.Array,
    harmonics: jax.Array,
    profiles: jax.Array,
    n_voices: int,
    n_harmonics: int,
    n_frames: int,
    n_samples: int,
    samplerate: int = 22050,
    freq_hz_range=(40, 4000),
) -> jax.Array:
    """Multi-voice harmonic synthesizer: complex-pair f0 trajectories +
    softmax mixtures over learned harmonic profiles (reference
    ``modules/ddsp.py:432-516`` HarmonicModel.forward, functional form —
    ``profiles`` is the learned (n_profiles, n_harmonics) table)."""
    batch = f0.shape[0]
    nyquist = samplerate / 2
    min_freq = freq_hz_range[0] / nyquist
    max_freq = freq_hz_range[1] / nyquist
    interval = max_freq - min_freq

    f0 = f0.reshape(batch, n_voices, 2, -1)
    n_profiles = profiles.shape[0]
    harmonics = harmonics.reshape(batch, n_voices, n_profiles, -1)

    f0_amp = jnp.linalg.norm(f0, axis=-2) ** 2
    f0_val = jnp.arctan2(f0[:, :, 1, :], f0[:, :, 0, :]) / jnp.pi
    f0_val = min_freq + (f0_val**2) * interval

    ratios = jnp.arange(2, 2 + n_harmonics) ** 2
    harmonic_freqs = jnp.clip(
        f0_val[:, :, None, :] * ratios[None, None, :, None], 0, 1
    )

    h = jnp.transpose(harmonics, (0, 1, 3, 2))
    h = jax.nn.softmax(h, axis=-1) @ profiles
    harmonic_amp = jnp.clip(jnp.transpose(h, (0, 1, 3, 2)), 0, 1)
    harmonic_amp = f0_amp[:, :, None, :] * harmonic_amp

    full_freq = jnp.concatenate([f0_val[:, :, None, :], harmonic_freqs], axis=2)
    full_amp = jnp.concatenate([f0_amp[:, :, None, :], harmonic_amp], axis=2)

    full_freq = interpolate_last_axis(
        full_freq.reshape(batch * n_voices, n_harmonics + 1, n_frames),
        n_samples,
    )
    full_amp = interpolate_last_axis(
        full_amp.reshape(batch * n_voices, n_harmonics + 1, n_frames),
        n_samples,
    )
    signal = full_amp * jnp.sin(jnp.cumsum(full_freq, axis=-1) * jnp.pi)
    signal = signal.reshape(batch, n_voices, n_harmonics + 1, n_samples)
    return jnp.sum(signal, axis=(1, 2)).reshape(batch, 1, n_samples)


class HarmonicModel:
    """Object form of ``harmonic_model`` holding its learned profile table
    (reference ``modules/ddsp.py:432-516``). ``init_profiles(key)`` gives
    the (n_profiles, n_harmonics) parameter, trained by the caller."""

    def __init__(
        self,
        n_voices: int = 8,
        n_profiles: int = 16,
        n_harmonics: int = 64,
        freq_hz_range=(40, 4000),
        samplerate: int = 22050,
        n_frames: int = 64,
        n_samples: int = 2**14,
    ):
        self.n_voices = n_voices
        self.n_profiles = n_profiles
        self.n_harmonics = n_harmonics
        self.freq_hz_range = freq_hz_range
        self.samplerate = samplerate
        self.n_frames = n_frames
        self.n_samples = n_samples

    def init_profiles(self, key: jax.Array) -> jax.Array:
        return jax.random.uniform(
            key, (self.n_profiles, self.n_harmonics), minval=0.0, maxval=0.1
        )

    def __call__(self, profiles, f0, harmonics) -> jax.Array:
        return harmonic_model(
            f0,
            harmonics,
            profiles,
            self.n_voices,
            self.n_harmonics,
            self.n_frames,
            self.n_samples,
            self.samplerate,
            self.freq_hz_range,
        )
