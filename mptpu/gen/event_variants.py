"""Remaining event-generator variants from the SIAM decoder family
(reference ``modules/eventgenerators/overfitresonance.py``:
``AudioModelEventGenerator`` ``:719-806``, ``WavetableModel`` ``:806-916``,
``SimpleEventGenerator`` ``:919-981``)."""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config.dotenv import Config
from ..ops.fft import fft_convolve
from ..ops.decompose import fft_frequency_recompose
from ..ops.overlap_add import overlap_add
from ..ops.phase import mag_phase_recomposition
from ..nn.init import uniform_init
from ..nn.linear import LinearOutputStack
from .generator import EventGenerator, ShapeSpec
from .overfitresonance import Lookup, Deformations
from .reverb import load_impulse_responses
from .schedule import DiracScheduler


class _DecayedNoiseLookup(Lookup):
    """Item table initialized as noise under random power-law decays
    (the reference's ``initialize=`` hook, ``overfitresonance.py:745-752``)."""

    latent_dim: int = 32
    frames: int = 128

    def _items(self):
        def init(k, shape):
            noise = jax.random.uniform(
                k, (self.n_items, self.latent_dim, self.frames),
                minval=-0.01, maxval=0.01,
            )
            env = jnp.linspace(1, 0, self.frames).reshape(1, 1, -1)
            decay = jax.random.uniform(
                jax.random.fold_in(k, 1),
                (self.n_items, self.latent_dim, 1),
                minval=2.0, maxval=200.0,
            )
            return (noise * env**decay).reshape(self.n_items, -1)

        return self.param("items", init, (self.n_items, self.n_samples))


class AudioModelEventGenerator(nn.Module, EventGenerator):
    """Latent-frame lookup -> per-frame (mag, dithered group-delay phase)
    -> irFFT + OLA (reference ``:719-806``)."""

    n_items: int
    n_samples: int
    n_frames: int
    n_events: int
    context_dim: int
    latent_dim: int = 32

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(params=(self.n_items,), amp=(1,))

    @nn.compact
    def __call__(self, params, times, amp, key):
        batch = params.shape[0]
        step = self.n_samples // self.n_frames
        window = step * 2
        n_coeffs = window // 2 + 1

        lat = _DecayedNoiseLookup(
            self.n_items,
            self.latent_dim * self.n_frames,
            selection_type="relu",
            latent_dim=self.latent_dim,
            frames=self.n_frames,
            name="items",
        )(params)
        phase_items = Lookup(
            self.n_items,
            self.latent_dim * self.n_frames,
            selection_type="relu",
            name="phase_items",
        )(params)

        lat = jnp.swapaxes(
            lat.reshape(-1, self.latent_dim, self.n_frames), 1, 2
        )
        pi = jnp.swapaxes(
            phase_items.reshape(-1, self.latent_dim, self.n_frames), 1, 2
        )
        kw = dict(kernel_init=uniform_init(0.1), bias_init=nn.initializers.zeros)
        mag = jnp.abs(nn.Dense(n_coeffs, name="to_mag", **kw)(lat))
        phase = nn.Dense(n_coeffs, name="to_phase", **kw)(pi)

        group_delay = jnp.linspace(0, jnp.pi, n_coeffs)
        phase = phase * group_delay * 1e-3
        dither = jax.random.uniform(
            key, phase.shape, minval=-1.0, maxval=1.0
        )
        phase = group_delay[None, None, :] + phase * dither
        phase = jnp.cumsum(phase, axis=1)

        from ..ops.fft import cexp

        spec = mag * cexp(phase)
        frames = jnp.fft.irfft(spec, n=window, axis=-1)
        audio = overlap_add(frames[:, None, :, :])[..., : self.n_samples]
        audio = audio.reshape(batch, -1, self.n_samples)
        audio = audio * jnp.abs(amp)

        scheduler = DiracScheduler(
            self.n_events, start_size=self.n_frames,
            n_samples=self.n_samples, pre_sparse=True,
        )
        return scheduler.schedule(times, audio)


class WavetableModel(nn.Module, EventGenerator):
    """Per-band learned wavetables recomposed to full rate, deformed over
    time, reverb'd, amplitude-scaled, scheduled (reference ``:806-916``)."""

    n_items: int
    n_samples: int
    n_frames: int
    n_events: int
    expressivity: int
    n_deformations: int = 128
    wavetable_samples: int = 16384
    lowest_band: int = 512

    @property
    def n_bands(self) -> int:
        return int(np.log2(self.wavetable_samples)) - int(
            np.log2(self.lowest_band)
        )

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(
            amplitudes=(1,),
            mix=(self.expressivity, self.n_items * self.n_bands),
            warp=(self.n_deformations,),
            room_choice=(8,),
            room_mix=(2,),
        )

    @nn.compact
    def __call__(self, p: Dict[str, jax.Array], times: jax.Array):
        batch = p["amplitudes"].shape[0]
        start = int(np.log2(self.lowest_band))

        bands = {}
        for i in range(self.n_bands):
            size = 2 ** (start + i)
            mx = p["mix"][:, :, :, i * self.n_items : (i + 1) * self.n_items]
            bnd = Lookup(
                self.n_items, size, selection_type="identity",
                init_scale=0.1, name=f"band_{size}",
            )(mx)
            bands[size] = bnd.reshape(batch, self.expressivity, -1)

        dry = fft_frequency_recompose(bands, self.wavetable_samples)
        dry = dry.reshape(batch, self.expressivity, -1)
        dry = jnp.pad(
            dry, ((0, 0), (0, 0), (0, self.n_samples - dry.shape[-1]))
        )

        d, _ = Deformations(
            128, self.expressivity * 128, full_size=self.n_samples,
            channels=self.expressivity, frames=128, name="warp",
        )(p["warp"])
        dry = jnp.sum(dry[:, None, :, :] * d, axis=2)

        verbs = load_impulse_responses(
            Config.impulse_response_path(), self.n_samples
        )
        verb = Lookup(
            verbs.shape[0], self.n_samples, fixed_items=verbs,
            selection_type="softmax", name="verb",
        )(p["room_choice"])
        wet = fft_convolve(dry, verb)
        stacked = jnp.stack([dry, wet], axis=-1)
        mix = jax.nn.softmax(p["room_mix"], axis=-1)
        final = jnp.sum(stacked * mix[:, :, None, :], axis=-1)
        final = final.reshape(batch, -1, self.n_samples)
        final = final * jnp.abs(p["amplitudes"])

        scheduler = DiracScheduler(
            self.n_events, start_size=self.n_frames,
            n_samples=self.n_samples, pre_sparse=True,
        )
        return scheduler.schedule(times, final)


class SimpleEventGenerator(nn.Module, EventGenerator):
    """Latent + positional table -> per-frame (mag, noisy phase) ->
    recomposition + OLA (reference ``:919-981``)."""

    context_dim: int
    n_frames: int
    n_samples: int
    n_events: int
    channels: int
    window_size: int = 512

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(param=(self.context_dim,))

    @nn.compact
    def __call__(self, param, times, key):
        batch = param.shape[0]
        n_coeffs = self.window_size // 2 + 1

        pos = self.param(
            "pos", uniform_init(0.01), (1, self.n_frames, self.channels)
        )
        x = nn.Dense(self.channels, kernel_init=uniform_init(0.1))(param)
        # fold any event axis into batch (the reference renders one event
        # vector per row, ``overfitresonance.py:956-959``)
        x = x.reshape(-1, 1, self.channels) + pos
        x = LinearOutputStack(
            channels=self.channels,
            layers=3,
            out_channels=n_coeffs * 2,
            in_channels=self.channels,
        )(x)
        x = x.reshape(-1, self.n_frames, n_coeffs, 2)
        mags = jnp.abs(x[..., 0:1])
        phase = x[..., 1:]
        noise = jax.random.uniform(key, phase.shape, minval=-1.0, maxval=1.0)
        phase = jnp.ones_like(phase) + phase * noise
        spec = jnp.concatenate([mags, phase], axis=-1)
        spec = mag_phase_recomposition(spec, jnp.linspace(0, 1, n_coeffs))
        frames = jnp.fft.irfft(spec, n=self.window_size, axis=-1)
        frames = frames.reshape(-1, 1, self.n_frames, self.window_size)
        audio = overlap_add(frames, apply_window=True)[..., : self.n_samples]
        audio = audio.reshape(batch, -1, self.n_samples)

        scheduler = DiracScheduler(
            self.n_events, start_size=self.n_frames,
            n_samples=self.n_samples, pre_sparse=True,
        )
        return scheduler.schedule(times, audio)
