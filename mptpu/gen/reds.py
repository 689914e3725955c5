"""F0 + harmonic-spacing resonance generator (reference
``modules/reds.py:50-196``: ``exponential_decay`` ``:50``, ``F0Resonance``
``:82``)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.norms import max_norm
from ..ops.upsample import interpolate_last_axis


def exponential_decay(
    decay_values: jax.Array,
    n_atoms: int,
    n_frames: int,
    base_resonance: float,
    n_samples: int,
) -> jax.Array:
    """sigmoid -> [base, ~1) per-frame decay -> log-cumsum-exp envelope,
    upsampled to n_samples (reference ``reds.py:50-64``, also
    ``eventgenerators/splat.py:24-37``)."""
    decay_values = jax.nn.sigmoid(decay_values.reshape(-1, n_atoms, 1))
    decay_values = jnp.broadcast_to(
        decay_values, decay_values.shape[:2] + (n_frames,)
    )
    resonance_factor = (1 - base_resonance) * 0.99
    decay = base_resonance + decay_values * resonance_factor
    decay = jnp.exp(jnp.cumsum(jnp.log(decay + 1e-12), axis=-1))
    return interpolate_last_axis(decay, n_samples)


class F0Resonance:
    """Harmonic stack: squared-sigmoid f0 in [min_hz, max_hz], cumsum
    harmonic spacing, per-octave exponential decay, optional global time
    decay (reference ``reds.py:82-196``). Stateless -> plain class."""

    def __init__(
        self,
        n_octaves: int,
        n_samples: int,
        min_hz: int = 20,
        max_hz: int = 3000,
        samplerate: int = 22050,
    ):
        self.samplerate = samplerate
        self.n_octaves = n_octaves
        self.n_samples = n_samples
        self.min_freq = min_hz / (samplerate // 2)
        self.max_freq = max_hz / (samplerate // 2)
        self.freq_range = self.max_freq - self.min_freq

    def __call__(
        self,
        f0: jax.Array,
        decay_coefficients: jax.Array,
        freq_spacing: jax.Array,
        sigmoid_decay: bool = True,
        apply_exponential_decay: bool = True,
        time_decay: Optional[jax.Array] = None,
    ) -> jax.Array:
        batch, n_events, _ = f0.shape

        f0 = (f0**2).reshape(batch, n_events, 1)

        exp_decays = exponential_decay(
            jax.nn.sigmoid(decay_coefficients) if sigmoid_decay else decay_coefficients,
            n_atoms=n_events,
            n_frames=self.n_octaves,
            base_resonance=0.01,
            n_samples=self.n_octaves,
        )

        f0 = (self.min_freq + f0 * self.freq_range) * jnp.pi
        factors = jnp.broadcast_to(
            freq_spacing, (batch, n_events, self.n_octaves)
        )
        factors = jnp.cumsum(factors, axis=-1)
        f0s = f0 * factors  # (batch, n_events, n_octaves) radians/sample

        # cumulative phase of a constant frequency == freq * (i + 1)
        steps = jnp.arange(1, self.n_samples + 1, dtype=f0s.dtype)
        osc = jnp.sin(f0s[..., None] * steps)

        if apply_exponential_decay:
            osc = osc * exp_decays[..., None]

        if time_decay is not None:
            frames = time_decay.shape[-1]
            ramp = jnp.linspace(1.0, 0.0, frames)
            ramp = ramp ** time_decay
            ramp = interpolate_last_axis(ramp, self.n_samples)
            ramp = ramp.reshape(-1, 1, self.n_samples)
            osc = osc * ramp.reshape(batch, n_events, 1, self.n_samples)

        osc = jnp.sum(osc, axis=2)
        return max_norm(osc, axis=-1)
