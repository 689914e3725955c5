"""Differentiable matching pursuit with *learned* atoms (reference
``mp.py:32-67`` — BASELINE config #1's gradient-trained variant).

Unlike the greedy engine (hard atom updates), atoms here are
nn.Parameters: each iteration FFT-convolves the residual with the
zero-padded atoms, picks the single best (atom, time) via ``sparsify2``'s
straight-through top-1, renders it, and subtracts. Trained with
``iterative_loss``. The loop is a ``lax.scan`` over iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.fft import fft_convolve
from ..sparse.topk import sparsify2


class MatchingPursuit(nn.Module):
    n_atoms: int
    atom_samples: int
    n_samples: int
    n_iterations: int

    def normalized_atoms(self, atoms):
        return jnp.pad(
            atoms, ((0, 0), (0, 0), (0, self.n_samples - self.atom_samples))
        )

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        batch = audio.shape[0]
        atoms = self.param(
            "atoms",
            lambda k, s: jax.random.uniform(k, s, minval=-0.01, maxval=0.01),
            (1, self.n_atoms, self.atom_samples),
        )
        na = self.normalized_atoms(atoms)

        def step(residual, _):
            spec = fft_convolve(residual, na)
            sparse, time, atom = sparsify2(spec, n_to_keep=1)
            a = atom @ na
            b = fft_convolve(a, time)
            return residual - b, b[:, 0, :]

        residual, channels = lax.scan(
            step, audio, None, length=self.n_iterations
        )
        return jnp.transpose(channels, (1, 0, 2))  # (batch, iters, n_samples)
