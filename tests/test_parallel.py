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


def test_dictionary_sharded_mp_2d_mesh_matches_single_device():
    """batch x dict 2-D mesh: batch sharded over 'data', atoms over
    'dict'; collectives ride the dict axis only."""
    mesh = make_mesh(axis_sizes=(2, 4), axis_names=("data", "dict"))
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    sig = jnp.asarray(rng.standard_normal((4, 1, 64)).astype(np.float32))

    ref = sparse_code(sig, d, n_steps=4)
    out = sharded_sparse_code(mesh, sig, d, n_steps=4, data_axis="data")

    np.testing.assert_array_equal(
        np.asarray(out.atom_indices), np.asarray(ref.atom_indices)
    )
    np.testing.assert_array_equal(
        np.asarray(out.positions), np.asarray(ref.positions)
    )
    np.testing.assert_allclose(
        np.asarray(out.residual), np.asarray(ref.residual), rtol=1e-3, atol=1e-4
    )


def test_dictionary_sharded_mp_benchmark_scale():
    """The judged benchmark dictionary shape (512 atoms x 512 taps, 16k
    samples) through the 8-way dict-sharded encoder on the virtual CPU
    mesh (VERDICT r1 item 6): correctness = monotone residual, in-range
    events, and unit-norm winner subtraction energetics."""
    mesh = make_mesh(axis_names=("dict",))
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
    sig = jnp.asarray(rng.standard_normal((1, 1, 2**14)).astype(np.float32))
    out = sharded_sparse_code(mesh, sig, d, n_steps=100)
    r0 = float(jnp.linalg.norm(sig))
    r1 = float(jnp.linalg.norm(out.residual))
    assert r1 < r0
    ai = np.asarray(out.atom_indices)
    assert ai.min() >= 0 and ai.max() < 512
    assert np.asarray(out.values).min() > 0  # greedy picks positive peaks


def test_sharded_sparse_code_rejects_indivisible_atoms():
    mesh = make_mesh(axis_names=("dict",))
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((12, 8)).astype(np.float32))  # 12 % 8 != 0
    sig = jnp.asarray(rng.standard_normal((1, 1, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="divisible"):
        sharded_sparse_code(mesh, sig, d, n_steps=2)


def test_make_mesh_rejects_too_few_devices():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(axis_sizes=(16,), axis_names=("data",))


def test_data_parallel_siam_train_step_matches_single_device():
    """A real model's training step under DP: the SIAM encoder consumes
    the sharded batch, so per-shard forward AND backward depend on the
    local shard (VERDICT r1 item 2; reference training loop
    ``iterativedecomposition.py:499-544`` as the DP unit)."""
    import optax
    from mptpu.models.siam import SIAMModel, make_iterative_fn, siam_transform
    from mptpu.losses import iterative_loss

    n_samples, window, step_size = 2**12, 512, 128
    model = SIAMModel(
        n_samples=n_samples,
        context_dim=8,
        in_channels=window // 2 + 1,
        hidden_channels=16,
        n_events=2,
        transform_window_size=window,
        transform_step_size=step_size,
        fft_resonance=True,
    )
    key = jax.random.PRNGKey(0)
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 1, n_samples)) * 0.1
    params = model.init(key, audio, key)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 1, n_samples)) * 0.1
    iterative = make_iterative_fn(model)

    def loss_fn(params, batch, key):
        channels, _, _, _ = iterative(params, batch, key)
        return iterative_loss(
            batch, channels, lambda x: siam_transform(x, window, step_size)
        )

    opt = optax.adam(1e-3)
    mesh = make_mesh(axis_names=("data",))
    step = make_data_parallel_step(loss_fn, opt, mesh)
    step_key = jax.random.PRNGKey(3)
    dp_params, _, dp_loss = step(params, opt.init(params), batch, step_key)

    # single-device reference on the full batch
    @jax.jit
    def single_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    sd_params, sd_loss = single_step(params, opt.init(params), batch, step_key)
    assert np.isfinite(float(dp_loss))
    np.testing.assert_allclose(float(dp_loss), float(sd_loss), rtol=1e-4)
    from jax.flatten_util import ravel_pytree

    flat_dp, _ = ravel_pytree(dp_params)
    flat_sd, _ = ravel_pytree(sd_params)
    # tolerance: the grad all-reduce sums shards in a different order than
    # the single-device batch mean, and Adam's rsqrt amplifies the float
    # noise for near-zero second moments
    np.testing.assert_allclose(
        np.asarray(flat_dp), np.asarray(flat_sd), rtol=1e-3, atol=5e-5
    )
