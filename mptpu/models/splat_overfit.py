"""Audio splatting overfit model (BASELINE config #3).

Capability parity with reference ``hierarchical.py:102-243``
(``OverfitHierarchicalEvents``) and ``experiments/e_2024_3_31``: 64 events
whose vectors + binary-tree times grow hierarchically, decoded by the
``SplattingEventGenerator``, fit to one segment with a multi-res STFT loss
(+ iterative loss / sparsity variants).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..gen.splat import SplattingEventGenerator
from ..nn.multihead import MultiHeadTransform
from ..losses.multiband_spec import flattened_multiband_spectrogram


def splat_loss_transform(x: jax.Array) -> jax.Array:
    """Multi-res spectrogram feature used by the splat overfit loss
    (reference ``hierarchical.py:199-208``)."""
    return flattened_multiband_spectrogram(
        x, stft_spec={"short": (64, 16)}, smallest_band_size=512
    )


class OverfitHierarchicalEvents(nn.Module):
    """Event vectors/times grown by binary splitting (reference
    ``hierarchical.py:102-192``). ``__call__(key)`` returns
    (events (1, n_events, n_samples), vectors, times)."""

    n_samples: int
    samplerate: int
    n_events: int
    context_dim: int

    @nn.compact
    def __call__(self, key: jax.Array, perturb: jax.Array | None = None):
        event_levels = int(np.log2(self.n_events))
        total_levels = int(np.log2(self.n_samples))
        rng = 0.1

        def u(lo, hi):
            def init(k, shape):
                return jax.random.uniform(k, shape, minval=lo, maxval=hi)

            return init

        events = self.param(
            "event_vectors", u(-rng, rng), (1, 2, self.context_dim)
        )
        times = self.param("times", u(-rng, rng), (1, 2, total_levels, 2))

        if perturb is not None:
            events = events + perturb

        for i in range(event_levels - 1):
            hier_ev = self.param(
                f"hier_event_vectors_{i}", u(-rng, rng), (1, 2, self.context_dim)
            )
            hier_t = self.param(
                f"hier_time_vectors_{i}",
                u(-rng, rng),
                (1, 2 ** (i + 2), total_levels, 2),
            )
            events = (
                events.reshape(1, -1, 1, self.context_dim)
                + hier_ev.reshape(1, 1, 2, self.context_dim)
            ).reshape(1, -1, self.context_dim)
            batch, n_events, n_bits, _ = times.shape
            times = jnp.repeat(
                times.reshape(batch, n_events, 1, n_bits, 2), 2, axis=2
            ).reshape(batch, n_events * 2, n_bits, 2)
            times = times + hier_t

        generator = SplattingEventGenerator(
            n_samples=self.n_samples,
            samplerate=self.samplerate,
            n_resonance_octaves=16,
            n_frames=self.n_samples // 256,
            hard_reverb_choice=False,
            hierarchical_scheduler=True,
            wavetable_resonance=False,
        )
        transform = MultiHeadTransform(
            self.context_dim,
            hidden_channels=128,
            shapes=generator.shape_spec,
            n_layers=1,
        )
        params = transform(events)
        rendered = generator(params, times, key)
        return rendered, events, times
