"""Shift-and-subtract matching-pursuit loss + serial transform-domain
subtraction (reference ``loss/serial.py:6-47``)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fft import fft_convolve, fft_shift


def serial_matching_pursuit(inp: jax.Array, target: jax.Array):
    """Greedily place each (unit-normed) event channel at its best
    correlation lag against the running target residual (reference
    ``loss/serial.py:6-27``).

    inp: (batch, n_events, n_samples); target: (batch, 1, n_samples)
    returns (residual, recon)
    """
    batch, n_events, n_samples = inp.shape
    norms = jnp.linalg.norm(inp, axis=-1, keepdims=True)
    inp = inp / (norms + 1e-8)

    def step(carry, atom):
        target, recon = carry
        atom = atom[:, None, :]  # (batch, 1, n_samples)
        feature_map = fft_convolve(atom, target)
        values = jnp.max(feature_map, axis=-1)
        maxes = jnp.argmax(feature_map, axis=-1)
        scalar = maxes.astype(inp.dtype) / n_samples
        shifted = fft_shift(atom, scalar[..., None]) * values[..., None]
        return (target - shifted, recon + shifted), None

    (residual, recon), _ = lax.scan(
        step,
        (target, jnp.zeros_like(target)),
        jnp.swapaxes(inp, 0, 1),
    )
    return residual, recon


def serial_loss(
    inp: jax.Array,
    target: jax.Array,
    transform: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """Subtract each transformed event channel from the transformed target
    and take the l1 of what is left (reference ``loss/serial.py:30-47``)."""
    t = transform(target)
    batch, n_events, n_samples = inp.shape
    x = transform(inp.reshape(-1, 1, n_samples))
    x = x.reshape((batch, n_events) + x.shape[1:])
    t = t - jnp.sum(x, axis=1)
    return jnp.sum(jnp.abs(t))
