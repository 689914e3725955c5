"""Long-tail experiment coverage: funcsong, audiooperator, roomsim/voxel,
phaseinvariance (reference scratch scripts ``funcsong.py``,
``audiooperator.py``, ``roomsim.py``, ``voxel.py``,
``phaseinvariance.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mptpu.gen.roomsim import RoomModel, roomsim
from mptpu.models.audiooperator import (
    AudioOperator,
    band_pos_encode,
    envelope_loss,
    generate_training_batch,
)
from mptpu.models.funcsong import (
    FuncSong,
    count_parameters,
    song_pos_encoding,
)


def test_funcsong_forward_and_descent():
    model = FuncSong(
        segment_size=256, in_channels=8, hidden_channels=16, n_layers=2,
        n_resonances=8,
    )
    pos = jax.vmap(
        lambda s: song_pos_encoding(s, 256, 4096, 8)
    )(jnp.asarray([0, 512], dtype=jnp.int32))
    params = model.init(jax.random.PRNGKey(0), pos)
    out = model.apply(params, pos)
    assert out.shape == (2, 1, 256)
    assert np.all(np.isfinite(np.asarray(out)))
    assert count_parameters(params) > 0

    target = jnp.sin(jnp.linspace(0, 40 * np.pi, 256)).reshape(1, 1, -1)
    target = jnp.broadcast_to(target, (2, 1, 256))

    def loss_fn(p):
        return jnp.mean((model.apply(p, pos) - target) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    first = float(loss_fn(params))

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    for _ in range(30):
        params, state, loss = step(params, state)
    assert float(loss) < first


def test_song_pos_encoding_is_absolute():
    # same crop content, different absolute position -> different features
    a = song_pos_encoding(jnp.int32(0), 128, 4096, 8)
    b = song_pos_encoding(jnp.int32(1024), 128, 4096, 8)
    assert a.shape == (8, 128)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_audiooperator_batch_rasterization():
    target, starts, durs, envs = generate_training_batch(
        jax.random.PRNGKey(0), 4, 1024, 32
    )
    assert target.shape == (4, 1, 1024)
    t = np.asarray(target)
    s = np.asarray(jnp.floor(starts * 1024)).astype(int)
    d = np.asarray(jnp.floor(durs * 1024)).astype(int)
    for i in range(4):
        # energy confined to [start, start + duration)
        before = t[i, 0, : s[i]]
        assert np.all(before == 0.0)
        end = min(s[i] + d[i], 1024)
        assert np.all(t[i, 0, end:] == 0.0)
        if end - s[i] > 2:
            assert t[i, 0, s[i]:end].max() > 0.0


def test_audiooperator_forward_and_loss():
    n_bands, model_dim = 8, 16
    model = AudioOperator(
        envelope_resolution=16, latent_dim=4,
        pos_encoding_dim=n_bands * 2, model_dim=model_dim,
    )
    key = jax.random.PRNGKey(1)
    target, starts, durs, envs = generate_training_batch(key, 2, 512, 16)
    latents = jax.random.uniform(key, (2, 1, 4), minval=-1, maxval=1)
    times = jnp.broadcast_to(
        jnp.linspace(0, 1, 512).reshape(1, 1, -1), (2, 1, 512)
    )
    te = band_pos_encode(times, n_bands)
    es = band_pos_encode(starts.reshape(-1, 1, 1), n_bands).reshape(2, 1, -1)
    ed = band_pos_encode(durs.reshape(-1, 1, 1), n_bands).reshape(2, 1, -1)
    params = model.init(key, es, ed, envs[:, None, :], latents, te)
    recon = model.apply(params, es, ed, envs[:, None, :], latents, te)
    assert recon.shape == (2, 1, 512)
    loss = envelope_loss(target, recon, 64, 16)
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda p: envelope_loss(
            target, model.apply(p, es, ed, envs[:, None, :], latents, te),
            64, 16,
        )
    )(params)
    gn = float(optax.global_norm(grads))
    assert np.isfinite(gn) and gn > 0


def test_band_pos_encode_interleaves():
    x = jnp.ones((1, 1, 4)) * 0.5
    out = band_pos_encode(x, 3, min_freq=1.0, max_freq=3.0)
    assert out.shape == (1, 1, 6, 4)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), np.sin(0.5 * np.ones(4)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 1]), np.cos(0.5 * np.ones(4)), rtol=1e-6
    )


def test_roomsim_shapes_and_propagation():
    bs, nf, W, H, D = 32, 8, 3, 4, 5
    nc = bs // 2 + 1
    transfer = jnp.full((nc, W, H, D), 0.99).at[0].set(0.0)
    control = (
        jnp.zeros((nf, bs, W, H, D))
        .at[0, :, 1, 1, 2]
        .set(jnp.sin(jnp.linspace(0, 6.28, bs)))
    )
    rec, frames = jax.jit(roomsim)(transfer, control)
    assert rec.shape == (nf * bs,)
    assert frames.shape == (nf, W, H)
    r = np.asarray(rec)
    assert np.all(np.isfinite(r)) and np.abs(r).max() > 0
    # energy spreads: by the last frame more than one voxel is lit
    f = np.asarray(frames)
    assert (f[-1] > 1e-9).sum() > (f[0] > 1e-9).sum()


def test_room_model_differentiable():
    model = RoomModel(room_size=3, voxel_size=16, n_frames=4)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params)
    assert out.shape == (1, 1, 64)

    g = jax.grad(lambda p: jnp.sum(model.apply(p) ** 2))(params)
    gn = float(optax.global_norm(g))
    assert np.isfinite(gn) and gn > 0


def test_phase_invariant_overfit_converges():
    """The phaseinvariance experiment core: raw audio fit through a
    mag-spec transform reduces transform-space loss (reference
    ``phaseinvariance.py:113-141``)."""
    from mptpu.ops.stft import stft
    from mptpu.train.overfit import overfit_model

    t = jnp.sin(jnp.linspace(0, 100 * np.pi, 2048)).reshape(1, 1, -1)
    real = stft(t, 256, 128, pad=True)

    def loss_fn(params, tgt, key):
        return jnp.mean((stft(params["audio"], 256, 128, pad=True) - real) ** 2)

    init = {"audio": jnp.zeros_like(t) + 1e-4}
    params, losses = overfit_model(
        init, loss_fn, t, n_iterations=30, lr=1e-2, log_every=29
    )
    assert losses[-1] < losses[0]


def test_textural_model_descends():
    """Hierarchical splitter-tree texture model (reference
    ``textural.py:44-131``): forward shapes, finite output, loss
    descends under the stft + confidence objective."""
    from mptpu.models.textural import TexturalModel, confidence_loss
    from mptpu.ops.stft import stft

    m = TexturalModel(
        n_samples=2**10, n_events=8, n_atoms=4, atom_size=64, latent_dim=4
    )
    p = m.init(jax.random.PRNGKey(0))
    out, logits = jax.jit(m.apply)(p)
    assert out.shape == (1, 1, 2**10)
    assert logits.shape == (1, 8, 10, 2)
    assert np.all(np.isfinite(np.asarray(out)))

    t = jnp.sin(jnp.linspace(0, 60 * np.pi, 2**10)).reshape(1, 1, -1)
    ts = stft(t, 256, 64, pad=True)

    def loss_fn(p):
        r, lg = m.apply(p)
        return (
            jnp.sum(jnp.abs(stft(r, 256, 64, pad=True) - ts))
            + 0.5 * confidence_loss(lg)
        )

    opt = optax.adam(1e-2)
    s = opt.init(p)
    first = float(loss_fn(p))

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    for _ in range(30):
        p, s, loss = step(p, s)
    assert float(loss) < first
