"""Greedy per-event energy-removal loss — the core SIAM/splat training
objective (reference ``modules/iterative.py:18-74``).

Transform target + per-event channels, sort channels loudest-first, then
reward each event for the energy it removes from the running residual.
The per-event loop is a ``lax.scan`` over the (static) event axis.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

TensorTransform = Callable[[jax.Array], jax.Array]


def sort_channels_descending_norm(x: jax.Array) -> jax.Array:
    """Sort event channels by descending l1 norm (reference ``:18-22``)."""
    diff = jnp.sum(jnp.abs(x), axis=-1)
    indices = jnp.argsort(diff, axis=-1)[:, ::-1]
    return jnp.take_along_axis(x, indices[:, :, None], axis=1)


def iterative_loss(
    target_audio: jax.Array,
    recon_channels: jax.Array,
    transform: TensorTransform,
    return_residual: bool = False,
    ratio_loss: bool = False,
    sort_channels: bool = True,
):
    """target_audio: (batch, 1, time); recon_channels: (batch, n_events, time).

    ``transform`` maps (batch, channels, time) -> any shape; it is applied
    once to the target and once to all channels (reference ``:24-74``).
    """
    batch = target_audio.shape[0]
    n_events = recon_channels.shape[1]
    time = recon_channels.shape[-1]

    target = transform(target_audio.reshape(batch, 1, time)).reshape(batch, -1)
    channels = transform(recon_channels.reshape(batch, n_events, time)).reshape(
        batch, n_events, -1
    )

    if sort_channels:
        channels = sort_channels_descending_norm(channels)

    def step(residual, current):
        start_norm = jnp.sum(jnp.abs(residual), axis=-1)
        new_residual = residual - current
        end_norm = jnp.sum(jnp.abs(new_residual), axis=-1)
        if ratio_loss:
            step_loss = jnp.sum(end_norm / (start_norm + 1e-12))
        else:
            step_loss = jnp.sum(-(start_norm - end_norm))
        return new_residual, step_loss

    # scan over events: channels (batch, n_events, D) -> (n_events, batch, D)
    residual, losses = lax.scan(
        step, target, jnp.swapaxes(channels, 0, 1)
    )
    loss = jnp.sum(losses)

    if return_residual:
        return residual, loss
    return loss
