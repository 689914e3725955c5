"""Extra model-family tests: complex SSM compression, learned-atom MP,
multiresolution shells."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

KEY = jax.random.PRNGKey(0)


def test_complex_ssm_compression():
    from mptpu.gen import CompressionModel, param_count

    m = CompressionModel(
        control_plane_dim=8, input_dim=64, state_matrix_dim=16, n_samples=2048
    )
    params = m.init(KEY)
    audio = m.apply(params)
    assert audio.shape == (1, 1, 2048)
    assert np.isfinite(np.asarray(audio)).all()
    assert param_count(params) > 0
    g = jax.grad(lambda p: jnp.sum(jnp.abs(m.apply(p))))(params)
    assert np.isfinite(float(optax.global_norm(g)))


def test_real_ssm_compression_variant():
    from mptpu.gen import CompressionModel

    m = CompressionModel(
        control_plane_dim=8,
        input_dim=64,
        state_matrix_dim=16,
        n_samples=2048,
        complex_domain=False,
    )
    params = m.init(KEY)
    audio = m.apply(params)
    assert audio.shape == (1, 1, 2048)


def test_learned_atom_mp_trains():
    from mptpu.models import MatchingPursuit
    from mptpu.losses import iterative_loss
    from mptpu.ops import stft

    m = MatchingPursuit(
        n_atoms=8, atom_samples=32, n_samples=512, n_iterations=3
    )
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 512)) * 0.1
    params = m.init(KEY, audio)

    def loss_fn(p):
        ch = m.apply(p, audio)
        return iterative_loss(audio, ch, lambda x: stft(x, 128, 64, pad=True))

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(8):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_multiresolution_shells():
    from mptpu.models import EncoderShell, DecoderShell

    dec = DecoderShell(
        channels=8, band_sizes=(512, 1024), n_samples=1024, latent_dim=16
    )
    z = jax.random.normal(KEY, (2, 16))
    dp = dec.init(jax.random.PRNGKey(2), z)
    out = dec.apply(dp, z)
    assert out.shape == (2, 1, 1024)
    assert np.isfinite(np.asarray(out)).all()
