"""Textural model: a binary tree of latent "splitters" that recursively
doubles one root latent into ``n_events`` event latents, each carrying
hierarchical-dirac time logits; events decode to atom mixtures placed by
FFT convolution (reference ``textural.py:20-131``).

TPU-first notes: every splitter layer is a Dense over the whole event
axis (one MXU matmul, no per-event loop); the time-placement is
:func:`mptpu.gen.schedule.hierarchical_dirac` (log2-depth, FFT-based);
everything is static-shape and fuses under one jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..gen.schedule import hierarchical_dirac
from ..gen.transfer import fft_convolve_correlation
from ..nn.init import uniform_init, uniform_range_init
from ..ops.upsample import ensure_last_axis_length


class Splitter(nn.Module):
    """Double the event axis: each event emits ``branching_factor``
    children with perturbed time logits and scaled latents (reference
    ``Splitter``, ``textural.py:20-41``)."""

    latent_dim: int
    time_dim: int
    branching_factor: int = 2
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, base_time):
        """x: (batch, n_events, latent); base_time: (batch, n_events,
        time_dim, 2) -> (offsets, split) with event axis doubled."""
        batch, n_events, latent_dim = x.shape
        kw = dict(kernel_init=uniform_init(0.02))
        to = nn.Dense(
            self.branching_factor * self.time_dim * 2, use_bias=False, **kw
        )(x).reshape(batch, n_events, self.branching_factor, self.time_dim, 2)
        offsets = base_time[:, :, None, :, :] + to * self.scale
        offsets = offsets.reshape(
            batch, n_events * self.branching_factor, self.time_dim, 2
        )
        split = nn.Dense(latent_dim * self.branching_factor, **kw)(x) * self.scale
        split = split.reshape(
            batch, n_events * self.branching_factor, latent_dim
        )
        return offsets, split


class TexturalModel(nn.Module):
    """Root latent -> log2(n_events) splitter layers -> atoms scheduled
    by hierarchical diracs (reference ``Model``, ``textural.py:44-131``).

    ``__call__`` returns (audio (1, 1, n_samples), choice logits) — the
    logits feed the reference's confidence loss (``textural.py:175-178``:
    push each soft binary choice toward certainty)."""

    n_samples: int = 2**17
    n_events: int = 128
    n_atoms: int = 32
    atom_size: int = 512
    latent_dim: int = 16

    @nn.compact
    def __call__(self):
        total_layers = int(np.log2(self.n_events))
        time_dim = int(np.log2(self.n_samples))

        base_latent = self.param(
            "base_latent", uniform_range_init(-0.01, 0.01), (1, self.latent_dim)
        )
        atoms = self.param(
            "atoms", uniform_range_init(-1.0, 1.0),
            (self.n_atoms, self.atom_size),
        )

        x = base_latent[:, None, :]  # (1, 1, latent)
        base_times = jnp.zeros((1, 1, time_dim, 2))
        for i in range(total_layers):
            base_times, x = Splitter(
                self.latent_dim, time_dim=time_dim,
                branching_factor=2, scale=1.0 / (i + 1),
            )(x, base_times)

        kw = dict(kernel_init=uniform_init(0.02))
        event_atoms = nn.Dense(self.n_atoms, **kw)(x) @ atoms
        event_atoms = ensure_last_axis_length(event_atoms, self.n_samples)
        amps = nn.Dense(1, **kw)(x)
        event_atoms = event_atoms * amps

        scheduled, logits = hierarchical_dirac(
            base_times, soft=True, return_logits=True
        )
        placed = fft_convolve_correlation(event_atoms, scheduled)
        return jnp.sum(placed, axis=1, keepdims=True), logits


def confidence_loss(logits: jax.Array) -> jax.Array:
    """Push every soft binary choice toward a hard one (reference
    ``textural.py:175-178``)."""
    mt = jnp.max(logits, axis=-1)
    return jnp.sum(jnp.abs(1.0 - mt))
