"""Loss layer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.losses import (
    iterative_loss,
    flattened_multiband_spectrogram,
    correlation_loss,
    least_squares_generator_loss,
    least_squares_disc_loss,
    serial_loss,
)
from mptpu.ops import stft

RNG = np.random.default_rng(0)


def _transform(x):
    return stft(x, 128, 64, pad=True)


def test_iterative_loss_perfect_reconstruction_is_minimal():
    target = jnp.asarray(RNG.standard_normal((2, 1, 1024)).astype(np.float32))
    # channels that sum to the target in transform space: a single channel
    # equal to the target removes all energy
    perfect = jnp.concatenate(
        [target, jnp.zeros((2, 3, 1024))], axis=1
    )
    silent = jnp.zeros((2, 4, 1024))
    l_perfect = float(iterative_loss(target, perfect, _transform))
    l_silent = float(iterative_loss(target, silent, _transform))
    assert l_perfect < l_silent


def test_iterative_loss_gradients_flow():
    target = jnp.asarray(RNG.standard_normal((1, 1, 512)).astype(np.float32))
    ch = jnp.asarray(RNG.standard_normal((1, 2, 512)).astype(np.float32) * 0.1)
    g = jax.grad(lambda c: iterative_loss(target, c, _transform))(ch)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_iterative_loss_residual_return():
    target = jnp.asarray(RNG.standard_normal((1, 1, 512)).astype(np.float32))
    ch = jnp.zeros((1, 2, 512))
    residual, loss = iterative_loss(target, ch, _transform, return_residual=True)
    t = _transform(target).reshape(1, -1)
    np.testing.assert_allclose(np.asarray(residual), np.asarray(t), rtol=1e-5)


def test_multiband_spectrogram_shapes():
    x = jnp.asarray(RNG.standard_normal((2, 1, 2048)).astype(np.float32))
    out = flattened_multiband_spectrogram(
        x, stft_spec={"short": (64, 16)}, smallest_band_size=512
    )
    assert out.shape[0] == 2 and out.shape[1] == 1
    assert out.shape[-1] > 0


def test_correlation_loss_zero_residual_small():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(RNG.standard_normal((1, 1, 4096)).astype(np.float32))
    same = float(correlation_loss(key, x, x, n_elements=64))
    other = jnp.asarray(RNG.standard_normal((1, 1, 4096)).astype(np.float32))
    diff = float(correlation_loss(key, x, other * 3, n_elements=64))
    assert same < diff


def test_gan_losses():
    j = jnp.asarray([0.5, 0.5])
    assert float(least_squares_generator_loss(j)) == 0.125
    assert float(least_squares_disc_loss(jnp.ones(2), jnp.zeros(2))) == 0.0


def test_serial_loss():
    target = jnp.asarray(RNG.standard_normal((1, 1, 512)).astype(np.float32))
    events = jnp.zeros((1, 3, 512))
    l = float(serial_loss(events, target, _transform))
    assert l > 0
