"""Conv-impulse event generator: learned noise transient -> resonance
chain -> reverb -> dirac schedule (reference
``modules/eventgenerators/convimpulse.py:85-163``)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import unit_norm
from ..nn.init import uniform_init
from ..utils.music import musical_scale_hz
from .generator import EventGenerator, ShapeSpec
from .impulse import GenerateImpulse
from .reverb import ReverbGenerator
from .schedule import DiracScheduler
from .transfer import ResonanceChain, make_waves


class ConvImpulseEventGenerator(nn.Module, EventGenerator):
    context_dim: int
    impulse_size: int
    resonance_size: int
    samplerate: int
    n_samples: int
    n_events: int = 1
    total_atoms: int = 4096

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(vecs=(self.context_dim,))

    @nn.compact
    def __call__(self, vecs: jax.Array, times: jax.Array, key: jax.Array):
        batch_size = vecs.shape[0]
        embeddings = nn.Dense(256, kernel_init=uniform_init(0.1))(vecs)
        amps = jnp.sum(times, axis=-1, keepdims=True)

        imp = GenerateImpulse(256, 128, self.impulse_size, 16, self.n_events)(
            embeddings, key
        )
        imp = unit_norm(imp)

        f0s = musical_scale_hz(
            start_midi=21, stop_midi=106, n_steps=self.total_atoms // 4
        )
        waves = make_waves(self.resonance_size, f0s.tolist(), int(self.samplerate))
        mixed = ResonanceChain(
            1,
            n_atoms=self.total_atoms,
            window_size=512,
            n_frames=256,
            total_samples=self.resonance_size,
            mix_channels=16,
            channels=64,
            latent_dim=256,
            initial=waves,
            learnable_resonances=False,
        )(embeddings, imp)
        mixed = mixed.reshape(batch_size, -1, self.resonance_size)
        mixed = unit_norm(mixed) * amps

        scheduler = DiracScheduler(
            n_events=self.n_events,
            start_size=self.n_samples // 256,
            n_samples=self.n_samples,
        )
        mixed = jnp.pad(
            mixed, ((0, 0), (0, 0), (0, self.n_samples - self.resonance_size))
        )
        final = scheduler.schedule(times, mixed)
        final = ReverbGenerator(
            self.context_dim, 3, self.samplerate, self.n_samples
        )(unit_norm(vecs, axis=-1), final)
        return final
