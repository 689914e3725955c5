"""Half-lapped overlap-add synthesis (frames -> samples).

Parity with reference ``modules/overlap_add.py:6-59``: optional Hann
window, 50% hop, interleave-and-shift-add. The reference's view/pad trick
is kept because it is already the optimal XLA formulation (two reshapes +
one add; no scatter needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .windows import hann_window


def overlap_add(
    x: jax.Array,
    apply_window: bool = True,
    flip: bool = False,
    trim: int | None = None,
) -> jax.Array:
    """(batch, channels, frames, window) -> (batch, channels, frames*window//2 + window//2)."""
    batch, channels, frames, samples = x.shape
    if apply_window:
        # periodic hann — scipy hann(samples, sym=False), reference :10
        win = hann_window(samples, periodic=True, dtype=x.dtype)
        x = x * win
    hop = samples // 2
    first = x[..., :hop].reshape(batch, channels, -1)
    second = x[..., hop:].reshape(batch, channels, -1)
    first = jnp.pad(first, ((0, 0), (0, 0), (0, hop)))
    second = jnp.pad(second, ((0, 0), (0, 0), (hop, 0)))
    if flip:
        first = first[..., ::-1]
    out = first + second
    if trim is not None:
        out = out[..., :trim]
    return out
