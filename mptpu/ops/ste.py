"""Straight-through estimators / hard-forward-soft-backward selections.

Parity with reference ``modules/softmax.py:7-36`` and ``soft_dirac``
(``modules/sparse.py:29-43``). The torch idiom
``backward + (forward - backward).detach()`` maps exactly onto
``backward + stop_gradient(forward - backward)`` — the gradient flows
through the soft path while the value is the hard path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def straight_through(forward: jax.Array, backward: jax.Array) -> jax.Array:
    """Value of ``forward``, gradient of ``backward``."""
    return backward + lax.stop_gradient(forward - backward)


def leaky_relu_ste(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    """Forward = exact ``relu(x)``; backward = leaky-relu gradient.

    The dead-relu escape hatch for amplitude gates: the SIAM encoder's
    event switch (``iterativedecomposition.py:207``) is a relu whose
    gradient dies when the energy-removal loss pushes every
    pre-activation negative in the cold start — the silence-collapse
    local optimum (BENCHMARKS.md SIAM notes). This keeps the forward
    bit-identical to the reference while the straight-through backward
    lets the optimizer walk back out of the dead region."""
    return straight_through(
        jax.nn.relu(x), jax.nn.leaky_relu(x, negative_slope)
    )


def _one_hot_argmax(x: jax.Array, axis: int, values: jax.Array) -> jax.Array:
    """One-hot along ``axis`` at the argmax, filled with ``values``."""
    idx = jnp.argmax(x, axis=axis, keepdims=True)
    hot = jnp.zeros_like(x)
    return jnp.put_along_axis(hot, idx, values, axis=axis, inplace=False)


def sparse_softmax(x: jax.Array, normalize: bool = False, axis: int = -1):
    """Softmax backward, one-hot(max prob) forward; when ``normalize`` the
    hot value is 1 (reference ``softmax.py:15-23``)."""
    soft = jax.nn.softmax(x, axis=axis)
    values = jnp.max(soft, axis=axis, keepdims=True)
    if normalize:
        values = values + (1 - values)
    hard = _one_hot_argmax(soft, axis, values)
    return straight_through(hard, soft)


def soft_dirac(x: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax backward, exact one-hot forward (reference
    ``sparse.py:29-43``)."""
    soft = jax.nn.softmax(x, axis=axis)
    values = jnp.ones_like(jnp.max(soft, axis=axis, keepdims=True))
    hard = _one_hot_argmax(soft, axis, values)
    return straight_through(hard, soft)


def soft_clamp(x: jax.Array) -> jax.Array:
    """Clamp to [0, 1] forward, identity backward (reference
    ``softmax.py:25-29``)."""
    return straight_through(jnp.clip(x, 0.0, 1.0), x)


def step_func(x: jax.Array) -> jax.Array:
    """Sign forward, identity backward (reference ``softmax.py:32-36``)."""
    return straight_through(jnp.sign(x), x)


def hard_softmax(
    key: jax.Array,
    x: jax.Array,
    axis: int = -1,
    invert: bool = False,
    tau: float = 1.0,
) -> jax.Array:
    """Hard Gumbel-softmax sample (reference ``softmax.py:7-12``).

    Randomness is explicit via ``key`` (torch's version draws from global
    RNG state).
    """
    if invert:
        from .norms import max_norm

        x = jnp.exp(max_norm(x))
    gumbels = -jnp.log(
        -jnp.log(jax.random.uniform(key, x.shape, minval=1e-20, maxval=1.0))
    )
    soft = jax.nn.softmax((x + gumbels) / tau, axis=axis)
    values = jnp.ones_like(jnp.max(soft, axis=axis, keepdims=True))
    hard = _one_hot_argmax(soft, axis, values)
    return straight_through(hard, soft)
