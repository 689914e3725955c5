"""The full REDS synth (reference ``modules/reds.py:369-573``
``RedsLikeModel``): per-atom parameter set
(env, mix, decays, f0/wavetable choice, noise filter, two resonance
filters, amplitudes, reverb choice/mix) rendered through the same
component chain as the splatting generator but with Gamma positioning
envelopes and FFT-shift placement."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.fft import fft_convolve, fft_shift
from ..ops.norms import unit_norm
from .generator import EventGenerator, ShapeSpec
from .reds import F0Resonance
from .reverb import ReverbGenerator
from .splat import (
    BandPassFilteredNoise,
    EnvelopeAndPosition,
    EvolvingFilteredResonance,
    ExponentialDecayEnvelope,
    Mixer,
    Resonance,
)


class RedsLikeModel(nn.Module, EventGenerator):
    """~16 parameters per atom (reference docstring ``reds.py:370-375``)."""

    n_resonance_octaves: int = 64
    n_samples: int = 2**15
    samplerate: int = 22050
    use_wavetables: bool = False
    n_wavetable_resonances: int = 4096

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(
            noise_osc_mix=(2,),
            f0_choice=(1,),
            decay_choice=(1,),
            freq_spacing=(1,),
            noise_filter=(2,),
            filter_decays=(1,),
            resonance_filter=(2,),
            resonance_filter2=(2,),
            decays=(1,),
            shifts=(1,),
            env=(2,),
            amplitudes=(1,),
            verb_params=(4,),
        )

    def setup(self):
        if self.use_wavetables:
            self.resonance_generator = Resonance(
                self.n_wavetable_resonances,
                self.n_samples,
                samplerate=self.samplerate,
                hard_choice=False,
            )
        else:
            self.resonance_generator = F0Resonance(
                n_octaves=self.n_resonance_octaves, n_samples=self.n_samples
            )
        self.noise_generator = BandPassFilteredNoise(self.n_samples)
        self.amp_envelope_generator = ExponentialDecayEnvelope(
            base_resonance=0.02, n_frames=128, n_samples=self.n_samples
        )
        self.evolving_resonance = EvolvingFilteredResonance(
            base_crossfade_resonance=0.02,
            crossfade_frames=128,
            n_samples=self.n_samples,
        )
        self.env_and_position = EnvelopeAndPosition(
            n_samples=self.n_samples, envelope_type="Gamma"
        )
        self.mixer = Mixer()
        self.verb = ReverbGenerator(4, 2, self.samplerate, self.n_samples)

    def __call__(self, p: Dict[str, jax.Array], key: jax.Array) -> jax.Array:
        batch = p["env"].shape[0]
        overall_mix = jax.nn.softmax(p["noise_osc_mix"], axis=-1)

        if self.use_wavetables:
            resonances = self.resonance_generator(p["f0_choice"])
        else:
            resonances = self.resonance_generator(
                p["f0_choice"], p["decay_choice"], p["freq_spacing"]
            )

        filtered_noise = self.noise_generator(
            key, p["noise_filter"][:, :, 0],
            jnp.abs(p["noise_filter"][:, :, 1]) + 1e-12,
        )
        filt_res, filt_res2, crossfade = self.evolving_resonance(
            resonances=resonances,
            decays=p["filter_decays"],
            start_filter_means=jnp.zeros_like(p["resonance_filter"][:, :, 0]),
            start_filter_stds=jnp.abs(p["resonance_filter"][:, :, 1]) + 1e-12,
            end_filter_means=jnp.zeros_like(p["resonance_filter2"][:, :, 0]),
            end_filter_stds=jnp.abs(p["resonance_filter2"][:, :, 1]) + 1e-12,
        )
        decays = self.amp_envelope_generator(p["decays"])
        positioned_noise = self.env_and_position(
            signals=filtered_noise, a=p["env"][:, :, 0], b=p["env"][:, :, 1]
        )
        res = fft_convolve(positioned_noise, filt_res * decays)
        res2 = fft_convolve(positioned_noise, filt_res2 * decays)
        mixed = self.mixer([res, res2], crossfade)
        final = self.mixer(
            [positioned_noise, mixed], overall_mix[:, :, None, :]
        )
        final = unit_norm(final.reshape(batch, -1, self.n_samples), axis=-1)
        final = final * jnp.abs(p["amplitudes"])
        # placement via fractional FFT shift (reference uses `shifts`)
        final = fft_shift(final, p["shifts"])
        final = self.verb(p["verb_params"], final)
        return final
