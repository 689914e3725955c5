"""DDSP-style audio models: learned oscillator banks + noise + reverb
(reference ``modules/ddsp.py`` ``OscillatorBank`` ``:188``, ``AudioModel``
``:518``)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.upsample import interpolate_last_axis
from ..nn.init import uniform_init
from ..nn.linear import LinearOutputStack
from .impulse import NoiseModel
from .reverb import NeuralReverb, load_impulse_responses
from ..config.dotenv import Config


class OscillatorBank(nn.Module):
    """Frame-rate (amp, freq) heads -> additive sine bank (reference
    ``ddsp.py:188-290``, sans the wavetable variant's debug path)."""

    input_channels: int
    n_osc: int
    n_audio_samples: int
    constrain: bool = False
    log_frequency: bool = False
    lowest_freq: float = 0.01
    complex_valued: bool = False
    amp_squared: bool = False

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        batch_size = x.shape[0]
        x = x.reshape(batch_size, self.input_channels, -1)
        xt = jnp.swapaxes(x, 1, 2)  # (batch, frames, channels)

        amp = jnp.swapaxes(
            nn.Dense(self.n_osc, kernel_init=uniform_init(0.1))(xt), 1, 2
        )
        freq = jnp.swapaxes(
            nn.Dense(self.n_osc, kernel_init=uniform_init(0.1))(xt), 1, 2
        )

        if self.complex_valued:
            a = jnp.sqrt(amp**2 + freq**2)
            f = jnp.arctan2(freq, amp) / jnp.pi  # angle(amp + i*freq)
            amp, freq = a, f
        else:
            amp = amp**2 if self.amp_squared else jax.nn.sigmoid(amp)
            freq = jax.nn.sigmoid(freq)

        if self.constrain:
            if self.log_frequency:
                bands = np.geomspace(self.lowest_freq, 1, self.n_osc)
            else:
                bands = np.linspace(self.lowest_freq, 1, self.n_osc)
            spans = np.diff(np.concatenate([[0], bands]))
            freq = jnp.asarray(bands)[None, :, None] + freq * jnp.asarray(
                spans
            )[None, :, None]

        amp_params, freq_params = amp, freq
        amp = interpolate_last_axis(amp, self.n_audio_samples)
        freq = interpolate_last_axis(freq, self.n_audio_samples)
        cum_freq = jnp.cumsum(freq * jnp.pi, axis=-1)
        sig = jnp.sin(cum_freq) * amp
        out = jnp.mean(sig, axis=1, keepdims=True)
        if return_params:
            return out, freq_params, amp_params
        return out


class AudioModel(nn.Module):
    """Oscillator bank + filtered noise + reverb mix (reference
    ``ddsp.py:518-576``)."""

    n_samples: int
    model_dim: int
    samplerate: int
    n_frames: int
    n_noise_frames: int
    complex_valued_osc: bool = False

    @nn.compact
    def __call__(self, x, key):
        x = x.reshape(-1, self.model_dim, self.n_frames)
        agg = jnp.mean(x, axis=-1)

        rooms = load_impulse_responses(
            Config.impulse_response_path(), self.n_samples
        )
        room = jax.nn.softmax(
            LinearOutputStack(
                self.model_dim, 1, out_channels=rooms.shape[0]
            )(agg),
            axis=-1,
        )
        mix = jax.nn.sigmoid(
            LinearOutputStack(self.model_dim, 1, out_channels=1)(agg)
        ).reshape(-1, 1, 1)

        harm = OscillatorBank(
            self.model_dim,
            self.model_dim,
            self.n_samples,
            constrain=True,
            lowest_freq=40 / (self.samplerate // 2),
            amp_squared=True,
            complex_valued=self.complex_valued_osc,
        )(x)
        noise = NoiseModel(
            self.model_dim,
            self.n_frames,
            self.n_noise_frames,
            self.n_samples,
            self.model_dim,
            squared=True,
            mask_after=1,
        )(x, key)

        dry = harm + noise
        wet = NeuralReverb(self.n_samples, rooms.shape[0], impulses=rooms)(
            dry, room
        )
        return dry * mix + wet * (1 - mix)
