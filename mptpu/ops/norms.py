"""Normalization ops (reference ``modules/normalization.py:4-86``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe_norm(x: jax.Array, axis, epsilon: float) -> jax.Array:
    """L2 norm whose gradient at 0 is 0 (torch's subgradient convention)
    instead of NaN: below epsilon the sqrt input is clamped, so the max
    picks a constant branch and the gradient vanishes."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, epsilon * epsilon))


def unit_norm(x: jax.Array, axis=-1, epsilon: float = 1e-8) -> jax.Array:
    n = _safe_norm(x, axis, epsilon)
    return x / (n + epsilon)


def max_norm(
    x: jax.Array, axis=-1, epsilon: float = 1e-8, return_value: bool = False
):
    n = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    normed = x / (n + epsilon)
    if return_value:
        return normed, n
    return normed


def limit_norm(x: jax.Array, axis=2, max_norm_value: float = 0.9999) -> jax.Array:
    """Clamp the norm along ``axis`` to at most ``max_norm_value``
    (reference ``normalization.py:78-86``)."""
    norm = _safe_norm(x, axis, 1e-8)
    unit = x / (norm + 1e-8)
    clamped = jnp.minimum(norm, max_norm_value)
    return unit * clamped


def example_norm(x: jax.Array, axis=(1, 2), epsilon: float = 1e-8) -> jax.Array:
    """Per-example std normalization (reference ``ExampleNorm``, ``:28-36``).

    Uses the unbiased (ddof=1) std to match torch.std defaults.
    """
    stds = jnp.std(x, axis=axis, keepdims=True, ddof=1)
    return x / (stds + epsilon)
