"""Straight-through estimator tests: forward hardness + backward softness."""

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.ops import (
    sparse_softmax,
    soft_dirac,
    soft_clamp,
    step_func,
    hard_softmax,
)


def test_soft_dirac_forward_is_one_hot():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32))
    out = np.asarray(soft_dirac(x))
    np.testing.assert_allclose(out.sum(axis=-1), 1.0, rtol=1e-5)
    assert ((out == 0) | np.isclose(out, 1.0)).all()
    assert (np.argmax(out, -1) == np.argmax(np.asarray(x), -1)).all()


def test_soft_dirac_backward_is_softmax_grad():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8,)).astype(np.float32))
    g_hard = jax.grad(lambda v: jnp.sum(soft_dirac(v) * jnp.arange(8.0)))(x)
    g_soft = jax.grad(lambda v: jnp.sum(jax.nn.softmax(v) * jnp.arange(8.0)))(x)
    np.testing.assert_allclose(np.asarray(g_hard), np.asarray(g_soft), rtol=1e-5)


def test_sparse_softmax_values():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 10)).astype(np.float32))
    out = np.asarray(sparse_softmax(x))
    soft = np.asarray(jax.nn.softmax(x, axis=-1))
    # exactly one nonzero per row, equal to the max softmax prob
    assert (np.count_nonzero(out, axis=-1) == 1).all()
    np.testing.assert_allclose(out.max(axis=-1), soft.max(axis=-1), rtol=1e-5)
    # normalized variant puts a 1 there
    out_n = np.asarray(sparse_softmax(x, normalize=True))
    np.testing.assert_allclose(out_n.max(axis=-1), 1.0, rtol=1e-5)


def test_soft_clamp_and_step():
    x = jnp.asarray([-0.5, 0.25, 1.5])
    np.testing.assert_allclose(np.asarray(soft_clamp(x)), [0.0, 0.25, 1.0])
    np.testing.assert_allclose(np.asarray(step_func(x)), [-1.0, 1.0, 1.0])
    # identity gradients
    g = jax.grad(lambda v: jnp.sum(soft_clamp(v) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_hard_softmax_one_hot():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((5, 12)).astype(np.float32))
    out = np.asarray(hard_softmax(key, x))
    np.testing.assert_allclose(out.sum(axis=-1), 1.0, rtol=1e-5)
    assert (np.count_nonzero(out, axis=-1) == 1).all()
