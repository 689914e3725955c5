"""Custom-VJP op tests (reference's hand-written autograd functions)."""

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.ops import (
    scalar_position,
    differentiable_fft_shift,
    schedule_atoms,
    position_render,
    diff_index,
)

RNG = np.random.default_rng(0)


def test_scalar_position_forward_one_hot():
    pos = jnp.asarray([[0.25, 0.75]])
    oh = np.asarray(scalar_position(pos, 16))
    assert oh.shape == (1, 2, 16)
    assert oh.sum() == 2.0
    # reference truncates: int(0.25 * 16 * 0.9999) == 3
    assert oh[0, 0, 3] == 1.0 and oh[0, 1, 11] == 1.0


def test_scalar_position_gradient_direction():
    """Gradient = mass(right) - mass(left): if the incoming gradient is
    larger to the right of the current position, the position should grow."""
    pos = jnp.asarray([[0.5]])
    weights = jnp.arange(16.0)  # increasing to the right

    g = jax.grad(lambda p: jnp.sum(scalar_position(p, 16) * weights))(pos)
    assert float(g[0, 0]) > 0


def test_fft_shifter_straight_through():
    items = jnp.asarray(RNG.standard_normal((1, 2, 32)).astype(np.float32))
    pos = jnp.asarray([[0.1], [0.2]])[None, :, 0:1]
    gi, gp = jax.grad(
        lambda i, p: jnp.sum(differentiable_fft_shift(i, p) ** 2),
        argnums=(0, 1),
    )(items, pos)
    assert np.isfinite(np.asarray(gi)).all()
    np.testing.assert_allclose(np.asarray(gp), 0.0)  # positions get zero grad


def test_position_render_and_schedule_atoms():
    clips = jnp.asarray(RNG.standard_normal((1, 2, 64)).astype(np.float32))
    pos = jnp.asarray([[0.25, 0.5]])
    out = position_render(pos, clips, 64)
    assert out.shape == (1, 2, 64)
    # clip 0 placed at sample 16; tail clipped
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, 16:], np.asarray(clips)[0, 0, :48], rtol=1e-5
    )

    targets = jnp.asarray(RNG.standard_normal((1, 1, 64)).astype(np.float32))
    gi, gp = jax.grad(
        lambda c, p: jnp.sum(schedule_atoms(c, p, targets) ** 2),
        argnums=(0, 1),
    )(clips, pos)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gp)).all()


def test_diff_index_lookup_and_grad():
    palette = jnp.linspace(-1.0, 1.0, 64)
    idx = jnp.asarray([0.0, 0.5, -0.5])
    vals = np.asarray(diff_index(palette, idx))
    np.testing.assert_allclose(vals, [0.0, 0.5, -0.5], atol=0.05)
    g = jax.grad(lambda i: jnp.sum(diff_index(palette, i) ** 2))(idx)
    assert np.isfinite(np.asarray(g)).all()
