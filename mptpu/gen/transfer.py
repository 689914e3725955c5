"""Resonance machinery: waveform tables, frequency-domain transfer
functions -> time-domain resonances, damped harmonic oscillators, resonance
banks/blocks/chains with time-varying mixes.

Capability parity with reference ``modules/transfer.py`` (``make_waves``
``:166``, ``freq_domain_transfer_function_to_resonance`` ``:202-279``,
``damped_harmonic_oscillator`` ``:17-43``, ``gaussian_bandpass_filtered``
``:131``, ``ResonanceBank`` ``:282``, ``TimeVaryingMix`` ``:357``,
``ResonanceBlock`` ``:397``, ``ResonanceChain`` ``:487``,
correlation-mode ``fft_convolve`` ``:548-569``).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from scipy.signal import square, sawtooth

from ..ops.fft import fft_convolve, to_complex, cexp
from ..ops.norms import max_norm, unit_norm
from ..ops.overlap_add import overlap_add
from ..ops.pdf import pdf2
from ..ops.upsample import interpolate_last_axis
from ..ops.windows import hamming_window
from ..nn.init import uniform_init
from ..nn.upsample import ConvUpsample


def damped_harmonic_oscillator(
    time: jax.Array,
    mass: jax.Array,
    damping: jax.Array,
    tension: jax.Array,
    initial_displacement: jax.Array,
    initial_velocity: float,
    do_clamp: bool = True,
) -> jax.Array:
    """Closed-form DHO (reference ``transfer.py:17-43``, a TorchScript
    kernel there; one fused XLA expression here)."""
    x = damping / (2 * mass)
    if do_clamp:
        omega = jnp.sqrt(jnp.clip(tension - x**2, 1e-12, jnp.inf))
    else:
        omega = jnp.sqrt(jnp.abs(tension - x**2))
    phi = jnp.arctan2(
        initial_velocity + x * initial_displacement,
        initial_displacement * omega,
    )
    a = initial_displacement / jnp.cos(phi)
    return a * jnp.exp(-x * time) * jnp.cos(omega * time - phi)


def fft_convolve_correlation(*args: jax.Array, correlation: bool = False):
    """N-arg FFT convolution with optional cross-correlation of the second
    argument (reference ``transfer.py:548-569``)."""
    n_samples = args[0].shape[-1]
    specs = [jnp.fft.rfft(x, n=2 * x.shape[-1], axis=-1) for x in args]
    if correlation:
        specs[1] = jnp.conj(specs[1])
    spec = reduce(lambda a, c: a * c, specs[1:], specs[0])
    return jnp.fft.irfft(spec, n=2 * n_samples, axis=-1)[..., :n_samples]


def gaussian_bandpass_filtered(
    means: jax.Array,
    stds: jax.Array,
    signals: jax.Array,
    normalize: bool = True,
) -> jax.Array:
    """Filter signals with gaussian magnitude responses (reference
    ``transfer.py:131-143``)."""
    samples = signals.shape[-1]
    n_coeffs = samples // 2 + 1
    gaussians = pdf2(means, stds, n_coeffs, normalize=normalize)
    spec = jnp.fft.rfft(signals, axis=-1)
    return jnp.fft.irfft(spec * gaussians, n=samples, axis=-1)


def make_waves_vectorized(
    n_samples: int, f0s: np.ndarray, samplerate: int
) -> jnp.ndarray:
    """(4 * len(f0s), n_samples) saw/square/tri/sine table (reference
    ``transfer.py:146-163``)."""
    f0s = np.asarray(f0s, dtype=np.float64) / (samplerate // 2)
    rps = f0s * np.pi
    radians = rps[:, None] * np.linspace(0, n_samples, n_samples)[None, :]
    waves = np.concatenate(
        [
            sawtooth(radians),
            square(radians),
            sawtooth(radians, 0.5),
            np.sin(radians),
        ],
        axis=0,
    )
    return jnp.asarray(waves, dtype=jnp.float32)


def make_waves(n_samples: int, f0s: List[float], samplerate: int) -> jnp.ndarray:
    """Loop form (reference ``transfer.py:166-199``); numerically equal to
    the vectorized form up to the reference's own tolerance."""
    sawtooths, squares, triangles, sines = [], [], [], []
    for f0 in f0s:
        f0 = f0 / (samplerate // 2)
        rps = f0 * np.pi
        radians = np.linspace(0, rps * n_samples, n_samples)
        squares.append(square(radians)[None, :])
        sawtooths.append(sawtooth(radians)[None, :])
        triangles.append(sawtooth(radians, 0.5)[None, :])
        sines.append(np.sin(radians)[None, :])
    waves = np.concatenate(sawtooths + squares + triangles + sines, axis=0)
    return jnp.asarray(waves, dtype=jnp.float32)


def freq_domain_transfer_function_to_resonance(
    window_size: int,
    coeffs: jax.Array,
    n_frames: int,
    apply_decay: bool = True,
    start_phase: Optional[jax.Array] = None,
    start_mags: Optional[jax.Array] = None,
    log_space_scan: bool = True,
    apply_window: bool = False,
    do_overlap_add: bool = True,
) -> jax.Array:
    """Per-bin decay coefficients -> exponentially-decaying resonance via
    log-space cumsum + group-delay phase + irFFT + OLA (reference
    ``transfer.py:202-279``)."""
    step_size = window_size // 2
    total_samples = step_size * n_frames
    expected_coeffs = window_size // 2 + 1

    group_delay = jnp.linspace(0, jnp.pi, expected_coeffs)

    res = coeffs.reshape(-1, expected_coeffs, 1)
    res = jnp.broadcast_to(res, res.shape[:2] + (n_frames,))
    if start_mags is not None:
        start = start_mags.reshape(res.shape[0], expected_coeffs, 1)
    else:
        start = jnp.ones((res.shape[0], expected_coeffs, 1), res.dtype)
    res = jnp.concatenate([start, res], axis=-1)

    if apply_decay:
        if log_space_scan:
            res = jnp.exp(jnp.cumsum(jnp.log(res + 1e-12), axis=-1))
        else:
            res = jnp.cumprod(res, axis=-1)

    spec_mag = res[..., :n_frames]
    spec_mag = jnp.transpose(spec_mag, (0, 2, 1))[:, None, :, :]
    # (batch, 1, n_frames, coeffs)

    phase = jnp.broadcast_to(
        group_delay[None, None, None, :], spec_mag.shape
    )
    phase = jnp.cumsum(phase, axis=2)
    if start_phase is not None:
        phase = phase + start_phase.reshape(-1, 1, 1, expected_coeffs)

    spec = spec_mag * cexp(phase)
    windowed = jnp.fft.irfft(spec, n=window_size, axis=-1)
    b = windowed.shape[0]
    if do_overlap_add:
        audio = overlap_add(windowed, apply_window=apply_window)[..., :total_samples]
    else:
        audio = windowed.reshape(b, 1, -1)[..., :total_samples]
    return max_norm(audio.reshape(-1, 1, total_samples))


class ResonanceBank(nn.Module):
    """Select resonances from a waveform table, apply a learned per-frame
    exponential decay and a learned filter (reference
    ``transfer.py:282-353``)."""

    n_resonances: int
    window_size: int
    n_frames: int
    initial: jnp.ndarray  # (n_resonances, n_samples)
    fft_based_resonance: bool = False
    learnable_resonances: bool = True
    base_resonance: float = 0.02

    @nn.compact
    def __call__(self, selection, initial_selection, filter_selection):
        n_coeffs = self.window_size // 2 + 1
        n_samples = self.initial.shape[-1]
        res_factor = (1 - self.base_resonance) * 0.99

        if self.learnable_resonances:
            res_samples = self.param(
                "res_samples",
                lambda key, shape: jnp.asarray(self.initial),
                self.initial.shape,
            )
        else:
            res_samples = jnp.asarray(self.initial)

        filters = self.param(
            "filters", uniform_init(1.0), (self.n_resonances, self.n_frames)
        )

        filt = filter_selection @ filters
        filt = filt.reshape(-1, 1, self.n_frames)
        filt = filt * hamming_window(self.n_frames, dtype=filt.dtype)

        decay = nn.Dense(
            self.n_frames,
            kernel_init=uniform_init(0.1),
            bias_init=nn.initializers.zeros,
        )(initial_selection)
        decay = jax.nn.sigmoid(decay)
        decay = self.base_resonance + decay * res_factor
        decay = jnp.exp(jnp.cumsum(jnp.log(1e-12 + decay), axis=-1))
        decay = decay.reshape(selection.shape[0], -1, self.n_frames)
        amp = interpolate_last_axis(decay, n_samples)

        if not self.fft_based_resonance:
            res = selection @ res_samples
        else:
            fft_res = self.param(
                "fft_res",
                nn.initializers.constant(-6.0),
                (self.n_resonances, n_coeffs),
            )
            coeffs = jax.nn.sigmoid(selection @ fft_res)
            res = freq_domain_transfer_function_to_resonance(
                self.window_size, coeffs, 128
            )

        amp = amp.reshape(res.shape)
        res = res * amp

        filt = jnp.pad(
            filt, ((0, 0), (0, 0), (0, n_samples - self.n_frames))
        ).reshape(res.shape)
        return fft_convolve(filt, res)[..., :n_samples]


class TimeVaryingMix(nn.Module):
    """Latent -> upsampled softmax mix over channels (reference
    ``transfer.py:357-394``)."""

    latent_dim: int
    channels: int
    n_mixer_channels: int
    n_frames: int

    @nn.compact
    def __call__(self, x, audio_channels):
        batch_size = x.shape[0]
        total_samples = audio_channels.shape[-1]
        mix = ConvUpsample(
            self.latent_dim,
            self.channels,
            start_size=4,
            end_size=self.n_frames,
            mode="nearest",
            out_channels=self.n_mixer_channels,
            from_latent=True,
        )(x)
        mix = mix.reshape(-1, self.n_mixer_channels, self.n_frames)
        mix = interpolate_last_axis(mix, total_samples)
        mix = jax.nn.softmax(mix, axis=1)
        out = jnp.sum(audio_channels * mix, axis=1)
        return out.reshape(batch_size, -1, total_samples)


class ResonanceBlock(nn.Module):
    """mix_channels parallel resonance selections convolved with the
    impulse, time-varying mixed, then dry/wet blended (reference
    ``transfer.py:397-485``)."""

    n_atoms: int
    window_size: int
    n_frames: int
    total_samples: int
    mix_channels: int
    channels: int
    latent_dim: int
    initial: jnp.ndarray
    learnable_resonances: bool = True

    @nn.compact
    def __call__(self, x, impulse):
        batch_size = x.shape[0]
        impulse_samples = impulse.shape[-1]

        final_mix = nn.Dense(2, kernel_init=uniform_init(0.1))(x)
        final_mix = jax.nn.softmax(final_mix, axis=-1)
        final_mix = final_mix.reshape(batch_size, -1, 1, 2)

        bank = ResonanceBank(
            self.n_atoms,
            self.window_size,
            self.n_frames,
            self.initial,
            fft_based_resonance=False,
            learnable_resonances=self.learnable_resonances,
        )

        resonances = []
        for i in range(self.mix_channels):
            sel = jax.nn.relu(
                nn.Dense(self.n_atoms, kernel_init=uniform_init(0.1))(x)
            )[:, None]
            init_sel = jax.nn.relu(
                nn.Dense(self.n_atoms, kernel_init=uniform_init(0.1))(x)
            )[:, None]
            filt_sel = jax.nn.relu(
                nn.Dense(self.n_atoms, kernel_init=uniform_init(0.1))(x)
            )[:, None]
            resonances.append(bank(sel, init_sel, filt_sel))

        impulse = jnp.pad(
            impulse,
            [(0, 0)] * (impulse.ndim - 1)
            + [(0, self.total_samples - impulse_samples)],
        ).reshape(-1, 1, self.total_samples)

        resonances = jnp.concatenate(resonances, axis=1).reshape(
            -1, self.mix_channels, self.total_samples
        )
        final = fft_convolve(resonances, impulse)
        mixed_down = TimeVaryingMix(
            self.latent_dim, self.channels, self.mix_channels, self.n_frames
        )(x, final)

        impulse = impulse.reshape(mixed_down.shape)
        imp_and_res = jnp.stack([impulse, mixed_down], axis=-1)
        return jnp.sum(imp_and_res * final_mix, axis=-1)


class ResonanceChain(nn.Module):
    """Chain of resonance blocks, each re-exciting the next; outputs mixed
    by a learned depth mix (reference ``transfer.py:487-546``)."""

    depth: int
    n_atoms: int
    window_size: int
    n_frames: int
    total_samples: int
    mix_channels: int
    channels: int
    latent_dim: int
    initial: jnp.ndarray
    learnable_resonances: bool = True

    @nn.compact
    def __call__(self, latent, impulse):
        batch_size = latent.shape[0]
        imp = impulse
        outputs = []
        for i in range(self.depth):
            imp = ResonanceBlock(
                self.n_atoms,
                self.window_size,
                self.n_frames,
                self.total_samples,
                self.mix_channels,
                self.channels,
                self.latent_dim,
                self.initial,
                self.learnable_resonances,
            )(latent, imp)
            outputs.append(imp[..., None])
        outputs = jnp.concatenate(outputs, axis=-1)
        mx = nn.Dense(self.depth, kernel_init=uniform_init(0.1))(latent)
        mx = mx.reshape(batch_size, -1, 1, self.depth)
        return jnp.sum(outputs * mx, axis=-1)
