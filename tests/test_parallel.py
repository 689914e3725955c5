"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: the JAX analog of a fake distributed backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mptpu.parallel import (
    make_mesh,
    shard_batch,
    make_data_parallel_step,
    sharded_sparse_code,
)
from mptpu.sparse import sparse_code
from mptpu.ops import unit_norm


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dictionary_sharded_mp_matches_single_device():
    mesh = make_mesh(axis_names=("dict",))
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    sig = jnp.asarray(rng.standard_normal((2, 1, 64)).astype(np.float32))

    ref = sparse_code(sig, d, n_steps=4)
    out = sharded_sparse_code(mesh, sig, d, n_steps=4)

    np.testing.assert_array_equal(
        np.asarray(out.atom_indices), np.asarray(ref.atom_indices)
    )
    np.testing.assert_array_equal(
        np.asarray(out.positions), np.asarray(ref.positions)
    )
    np.testing.assert_allclose(
        np.asarray(out.values), np.asarray(ref.values), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.residual), np.asarray(ref.residual), rtol=1e-3, atol=1e-4
    )


def test_data_parallel_step_runs_and_matches_single_device():
    mesh = make_mesh(axis_names=("data",))
    rng = np.random.default_rng(1)
    w0 = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    batch = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))

    def loss_fn(params, batch, key):
        return jnp.mean((batch @ params) ** 2)

    opt = optax.sgd(0.1)
    step = make_data_parallel_step(loss_fn, opt, mesh)
    params, opt_state, loss = step(
        w0, opt.init(w0), batch, jax.random.PRNGKey(0)
    )

    # single-device reference
    g = jax.grad(loss_fn)(w0, batch, None)
    expected = w0 - 0.1 * g
    np.testing.assert_allclose(
        np.asarray(params), np.asarray(expected), rtol=1e-5, atol=1e-6
    )
    assert np.isfinite(float(loss))
