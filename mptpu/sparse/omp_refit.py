"""Orthogonal-MP amplitude re-fit for greedy sparse codes.

Greedy MP (``sparse_code``; reference ``modules/matchingpursuit.py:
269-328``) fixes every event's amplitude against the residual at
selection time — atoms selected later change the optimal amplitude of
atoms selected earlier, and the greedy values are never revisited. This
pass re-solves ALL event amplitudes jointly (the classic OMP upgrade,
which the reference does not have): render each event at unit amplitude,
solve the ``n_steps x n_steps`` normal equations against the original
signal, and rebuild the residual. Guaranteed not to increase waveform
error (the greedy amplitudes are in the feasible set); two matmuls and a
tiny solve, all MXU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.refit import refit_gains
from .matching_pursuit import (
    SparseCodeResult,
    _as3d,
    _normalize_dict,
    scatter_events,
)


def event_tracks(
    result: SparseCodeResult, d: jax.Array, n_samples: int
) -> jax.Array:
    """Render every event at UNIT amplitude into its own full-length
    track: ``(batch, n_steps, n_samples)``. Memory is
    ``n_steps x batch x n_samples`` floats — fine at codec scale
    (100 steps x 16k samples x batch 32 = ~200 MB on-device)."""
    d3 = _normalize_dict(_as3d(d))
    atom_size = d3.shape[-1]
    S, B = result.atom_indices.shape
    atoms = d3[result.atom_indices][:, :, 0, :]  # (S, B, A)
    window = result.positions[..., None] + jnp.arange(atom_size)  # (S, B, A)
    tracks = jnp.zeros((S, B, n_samples + atom_size), atoms.dtype)
    s_idx = jnp.broadcast_to(jnp.arange(S)[:, None, None], window.shape)
    b_idx = jnp.broadcast_to(jnp.arange(B)[None, :, None], window.shape)
    tracks = tracks.at[s_idx, b_idx, window].add(atoms)
    # energy past the signal end is DROPPED, matching scatter_events /
    # the reference's boundary-clipped placement
    return jnp.swapaxes(tracks[..., :n_samples], 0, 1)  # (B, S, N)


def omp_refit(
    signal: jax.Array,
    result: SparseCodeResult,
    d: jax.Array,
    ridge: float = 1e-6,
) -> SparseCodeResult:
    """Jointly re-solve the amplitudes of a greedy sparse code.

    Args:
      signal: ``(batch, 1, n_samples)`` the original signal the code was
        computed from (single-channel; the greedy engines code C=1).
      result: the greedy ``sparse_code`` output to refine.
      d: the dictionary used to code (normalized internally, same as the
        coder).
      ridge: relative Tikhonov weight for the normal-equation solve.

    Returns:
      A new :class:`SparseCodeResult` with the same atoms/positions,
      jointly-optimal ``values``, and the residual rebuilt against them.
    """
    if signal.shape[1] != 1:
        raise ValueError(
            f"omp_refit supports single-channel signals, got C={signal.shape[1]}"
        )
    n_samples = signal.shape[-1]
    tracks = event_tracks(result, d, n_samples)  # (B, S, N)
    values = refit_gains(signal, tracks, ridge=ridge)  # (B, S)
    new_values = jnp.swapaxes(values, 0, 1)  # (S, B)
    recon = scatter_events(
        result.atom_indices,
        result.positions,
        new_values,
        _normalize_dict(_as3d(d)),
        n_samples,
        channels=1,
        batch=signal.shape[0],
    )
    return SparseCodeResult(
        result.atom_indices, result.positions, new_values, signal - recon
    )
