"""Weight initialization (reference ``util/weight_init.py:3-16``:
uniform(-v, v) weights, zero bias)."""

from __future__ import annotations

import jax


def uniform_init(scale: float = 0.1):
    """flax-compatible initializer: uniform in [-scale, scale]."""

    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-scale, maxval=scale
        )

    return init


def uniform_range_init(low: float, high: float):
    """flax-compatible initializer: uniform in [low, high] (the
    reference's ``tensor.uniform_(a, b)`` idiom)."""

    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, minval=low, maxval=high)

    return init
