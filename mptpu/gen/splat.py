"""Gamma/Gaussian audio splatting event generator.

Capability parity with reference ``modules/eventgenerators/splat.py:24-469``:
bandpass-filtered noise positioned by a Gaussian/Gamma envelope, convolved
with a decaying, cross-fading filtered resonance (F0 harmonic stack or
wavetable), dry/wet reverb, and dirac scheduling. All parameters arrive as
a dict matching ``shape_spec`` — either nn.Parameters (overfit mode,
``hierarchical.py``/``e_2024_3_31``) or MultiHeadTransform outputs.

Design: the generator itself is a *pure function* of (params, noise); the
only trainable state lives in the reverb generator's MLPs, exposed as a
small flax module.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.fft import fft_convolve
from ..ops.norms import unit_norm
from ..ops.pdf import pdf2, gamma_pdf
from ..utils.music import musical_scale_hz
from .generator import EventGenerator, ShapeSpec
from .reds import F0Resonance, exponential_decay
from .reverb import ReverbGenerator
from .schedule import DiracScheduler, HierarchicalDiracModel
from .transfer import gaussian_bandpass_filtered, make_waves
from ..ops.ste import sparse_softmax


class BandPassFilteredNoise:
    """(reference ``splat.py:40-54``)"""

    def __init__(self, n_samples: int, n_atoms: int = 1):
        self.n_samples = n_samples
        self.n_atoms = n_atoms

    def __call__(self, key, means, stds):
        noise = jax.random.uniform(
            key, (1, self.n_atoms, self.n_samples), minval=-1.0, maxval=1.0
        )
        return gaussian_bandpass_filtered(means, stds, noise)


class Resonance:
    """Wavetable resonance chooser (reference ``splat.py:57-85``)."""

    def __init__(
        self,
        n_resonances: int,
        n_samples: int,
        samplerate: int,
        hard_choice: bool = False,
    ):
        self.n_resonances = n_resonances
        self.n_samples = n_samples
        self.hard_choice = hard_choice
        f0s = musical_scale_hz(
            start_midi=21, stop_midi=106, n_steps=n_resonances // 4
        )
        self.waves = make_waves(n_samples, f0s.tolist(), samplerate).reshape(
            1, n_resonances, n_samples
        )

    def __call__(self, choice: jax.Array) -> jax.Array:
        if self.hard_choice:
            resonances = sparse_softmax(choice, normalize=True, axis=-1)
        else:
            resonances = jax.nn.relu(choice)
        return resonances @ self.waves


class ExponentialDecayEnvelope:
    """(reference ``splat.py:88-103``)"""

    def __init__(self, base_resonance: float, n_frames: int, n_samples: int):
        self.base_resonance = base_resonance
        self.n_frames = n_frames
        self.n_samples = n_samples

    def __call__(self, decay_values: jax.Array) -> jax.Array:
        batch, n_events, _ = decay_values.shape
        return exponential_decay(
            decay_values,
            n_atoms=n_events,
            n_frames=self.n_frames,
            base_resonance=self.base_resonance,
            n_samples=self.n_samples,
        )


class EvolvingFilteredResonance:
    """Crossfade between two filtered versions of the resonance
    (reference ``splat.py:106-147``)."""

    def __init__(
        self,
        base_crossfade_resonance: float,
        crossfade_frames: int,
        n_samples: int,
    ):
        self.base_crossfade_resonance = base_crossfade_resonance
        self.crossfade_frames = crossfade_frames
        self.n_samples = n_samples

    def __call__(
        self,
        resonances,
        decays,
        start_filter_means,
        start_filter_stds,
        end_filter_means,
        end_filter_stds,
    ):
        batch, n_events, _ = decays.shape
        start_resonance = gaussian_bandpass_filtered(
            start_filter_means, start_filter_stds, resonances
        )
        end_resonance = gaussian_bandpass_filtered(
            end_filter_means, end_filter_stds, resonances
        )
        filt_crossfade = exponential_decay(
            decays,
            n_atoms=n_events,
            n_frames=self.crossfade_frames,
            base_resonance=self.base_crossfade_resonance,
            n_samples=self.n_samples,
        )
        filt_crossfade_inverse = 1 - filt_crossfade
        stacked = jnp.stack([filt_crossfade, filt_crossfade_inverse], axis=-1)
        return start_resonance, end_resonance, stacked


class EnvelopeAndPosition:
    """Gaussian or Gamma positioning envelope (reference
    ``splat.py:150-192``)."""

    def __init__(
        self,
        n_samples: int,
        envelope_type: str = "Gaussian",
        gaussian_envelope_factor: float = 0.1,
    ):
        self.n_samples = n_samples
        self.envelope_type = envelope_type
        self.gaussian_envelope_factor = gaussian_envelope_factor
        self.gamma_ramp_size = 128
        self.gamma_ramp_exponent = 2

    def __call__(self, signals, a, b):
        if self.envelope_type == "Gaussian":
            envelopes = pdf2(
                a,
                (jnp.abs(b) + 1e-12) * self.gaussian_envelope_factor,
                self.n_samples,
            )
        elif self.envelope_type == "Gamma":
            envelopes = gamma_pdf(
                jnp.abs(a) + 1e-12, jnp.abs(b) + 1e-12, self.n_samples
            )
            ramp = jnp.zeros_like(envelopes)
            ramp = ramp.at[..., : self.gamma_ramp_size].set(
                jnp.linspace(0, 1, self.gamma_ramp_size)
                ** self.gamma_ramp_exponent
            )
            envelopes = envelopes * ramp
        else:
            raise ValueError(f"{self.envelope_type} is not supported")
        return signals * envelopes


class Mixer:
    """(reference ``splat.py:195-214``)"""

    def __call__(self, signals, mix):
        stacked = jnp.stack(signals, axis=-1)
        return jnp.sum(stacked * mix, axis=-1)


class SplattingEventGenerator(nn.Module, EventGenerator):
    """The audio-splatting decoder (reference ``splat.py:217-469``).

    ``__call__(params: dict, key)`` with ``params`` matching
    ``shape_spec`` entries of shape (batch, n_events, *shape).
    """

    n_samples: int
    samplerate: int
    n_resonance_octaves: int
    n_frames: int
    hard_reverb_choice: bool = False
    hierarchical_scheduler: bool = False
    wavetable_resonance: bool = False
    n_resonances: int = 1024

    @property
    def shape_spec(self) -> ShapeSpec:
        if not self.wavetable_resonance:
            return dict(
                env=(2,),
                mix=(2,),
                decay=(1,),
                filter_decay=(1,),
                f0_choice=(1,),
                decay_choice=(1,),
                freq_spacing=(1,),
                noise_filter=(2,),
                resonance_filter_1=(2,),
                resonance_filter_2=(2,),
                amp=(1,),
                verb_params=(4,),
                time_decays=(self.n_resonance_octaves,),
            )
        return dict(
            env=(2,),
            mix=(2,),
            filter_decay=(1,),
            decay_choice=(1,),
            resonance_choice=(self.n_resonances,),
            noise_filter=(2,),
            resonance_filter_1=(2,),
            resonance_filter_2=(2,),
            amp=(1,),
            verb_params=(4,),
        )

    def setup(self):
        if self.wavetable_resonance:
            self.resonance_generator = Resonance(
                self.n_resonances,
                self.n_samples,
                samplerate=self.samplerate,
                hard_choice=False,
            )
        else:
            self.resonance_generator = F0Resonance(
                self.n_resonance_octaves,
                self.n_samples,
                min_hz=20,
                max_hz=3000,
                samplerate=self.samplerate,
            )
        self.noise_generator = BandPassFilteredNoise(self.n_samples)
        self.amp_envelope_generator = ExponentialDecayEnvelope(
            base_resonance=0.1,
            n_frames=self.n_frames,
            n_samples=self.n_samples,
        )
        self.evolving_resonance = EvolvingFilteredResonance(
            base_crossfade_resonance=0.02,
            crossfade_frames=self.n_frames,
            n_samples=self.n_samples,
        )
        self.env_and_position = EnvelopeAndPosition(
            n_samples=self.n_samples,
            envelope_type="Gaussian",
            gaussian_envelope_factor=0.5,
        )
        self.mixer = Mixer()
        self.verb = ReverbGenerator(
            4,
            2,
            self.samplerate,
            self.n_samples,
            hard_choice=self.hard_reverb_choice,
        )
        if self.hierarchical_scheduler:
            self.scheduler = HierarchicalDiracModel(
                n_events=1, signal_size=self.n_samples
            )
        else:
            self.scheduler = DiracScheduler(
                n_events=1,
                start_size=self.n_samples // 256,
                n_samples=self.n_samples,
            )

    def __call__(self, params: Dict[str, jax.Array], times: jax.Array, key: jax.Array):
        if self.wavetable_resonance:
            return self.forward_wavetable(params, times, key)
        return self.forward_f0(params, times, key)

    def forward_f0(self, p: Dict[str, jax.Array], times: jax.Array, key: jax.Array):
        batch = p["env"].shape[0]
        overall_mix = jax.nn.softmax(p["mix"], axis=-1)

        resonances = self.resonance_generator(
            p["f0_choice"],
            p["decay"],
            p["freq_spacing"],
            sigmoid_decay=True,
            time_decay=1 + jax.nn.sigmoid(p["time_decays"]) * 80,
        )
        return self._common(p, times, key, resonances, overall_mix, batch,
                            verb_before_schedule=False)

    def forward_wavetable(self, p: Dict[str, jax.Array], times: jax.Array, key: jax.Array):
        batch = p["env"].shape[0]
        overall_mix = jax.nn.softmax(p["mix"], axis=-1)
        resonances = self.resonance_generator(p["resonance_choice"])
        decays = self.amp_envelope_generator(p["decay_choice"])
        return self._common(p, times, key, resonances, overall_mix, batch,
                            decays=decays, verb_before_schedule=True)

    def _common(
        self,
        p,
        times,
        key,
        resonances,
        overall_mix,
        batch,
        decays: Optional[jax.Array] = None,
        verb_before_schedule: bool = True,
    ):
        filtered_noise = self.noise_generator(
            key,
            p["noise_filter"][:, :, 0],
            jnp.abs(p["noise_filter"][:, :, 1]) + 1e-12,
        )
        filtered_resonance, filt_res_2, filt_crossfade_stacked = (
            self.evolving_resonance(
                resonances=resonances,
                decays=p["filter_decay"],
                start_filter_means=jnp.zeros_like(p["resonance_filter_1"][:, :, 0]),
                start_filter_stds=jnp.abs(p["resonance_filter_1"][:, :, 1]) + 1e-12,
                end_filter_means=jnp.zeros_like(p["resonance_filter_2"][:, :, 0]),
                end_filter_stds=jnp.abs(p["resonance_filter_2"][:, :, 1]) + 1e-12,
            )
        )
        if decays is not None:
            filtered_resonance = filtered_resonance * decays
            filt_res_2 = filt_res_2 * decays

        positioned_noise = self.env_and_position(
            signals=filtered_noise, a=p["env"][:, :, 0], b=p["env"][:, :, 1]
        )
        res = fft_convolve(positioned_noise, filtered_resonance)
        res2 = fft_convolve(positioned_noise, filt_res_2)
        mixed = self.mixer([res, res2], filt_crossfade_stacked)
        final = self.mixer(
            [positioned_noise, mixed], overall_mix[:, :, None, :]
        )
        final = final.reshape(batch, -1, self.n_samples)
        final = unit_norm(final, axis=-1)
        final = final * jnp.abs(p["amp"])

        if verb_before_schedule:
            final = self.verb(p["verb_params"], final)
            final = self.scheduler.schedule(times, final)
        else:
            final = self.scheduler.schedule(times, final)
            final = self.verb(p["verb_params"], final)
        return final
