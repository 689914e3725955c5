"""Long-tail experiment components (reference spiking.py / energy.py /
resonancemodel.py / freqdomain.py — SURVEY §2.4 long tail)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestAutocorrelationLoss:
    def test_identical_audio_zero_loss(self):
        from mptpu.losses.autocorrelation import AutocorrelationLoss

        ac = AutocorrelationLoss(n_channels=8, filter_size=64)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 1024)) * 0.1
        assert float(ac(x, x)) == 0.0
        y = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1024)) * 0.1
        assert float(ac(x, y)) > 0.0

    def test_multiband_loss_runs(self):
        from mptpu.losses.autocorrelation import AutocorrelationLoss

        ac = AutocorrelationLoss(n_channels=8, filter_size=64)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2048)) * 0.1
        y = x * 0.5
        l = float(ac.multiband_loss(x, y, min_size=512))
        assert np.isfinite(l) and l > 0


class TestDecayLoss:
    def test_penalizes_non_decaying_envelopes(self):
        from mptpu.losses.autocorrelation import DecayLoss

        n = 4096
        dl = DecayLoss(n, n_decays=8, window_size=256)
        t = np.arange(n) / 22050
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        decaying = jnp.asarray((tone * np.exp(-6 * t / t[-1])).reshape(1, 1, -1))
        growing = jnp.asarray((tone * np.exp(+6 * (t / t[-1] - 1))).reshape(1, 1, -1))
        # growing envelopes leave more post-average rectified energy
        f_dec = float(jnp.sum(dl.features(decaying)))
        f_grow = float(jnp.sum(dl.features(growing)))
        assert f_grow > f_dec
        assert float(dl(decaying, decaying)) == 0.0


class TestEnergyModel:
    def test_forward_shapes_and_discontinuity(self):
        from mptpu.gen.energy import (
            EnergyInstrumentModel,
            compute_discontinuity,
            to_blocks,
            blocks_to_samples,
        )

        n = 2048
        model = EnergyInstrumentModel(
            input_channels=1, model_channels=16, block_size=128, n_layers=2
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, n)) * 0.1
        params = model.init(jax.random.PRNGKey(1), x)
        out = model.apply(params, x)
        assert out.shape == (1, 1, n)
        assert np.all(np.isfinite(np.asarray(out)))

        b = to_blocks(out, 128)
        assert b.shape == (1, 1, n // 128, 128)
        np.testing.assert_array_equal(
            np.asarray(blocks_to_samples(b)), np.asarray(out)
        )
        smooth = jnp.ones((1, 1, 4, 8))
        assert float(compute_discontinuity(smooth)) == 0.0
        jumpy = jnp.ones((1, 1, 4, 8)).at[0, 0, 1, 0].set(5.0)
        assert float(compute_discontinuity(jumpy)) > 0.0

    def test_overfit_reduces_loss(self):
        import optax
        from mptpu.gen.energy import EnergyInstrumentModel
        from mptpu.ops.stft import stft

        n = 1024
        target = jax.random.normal(jax.random.PRNGKey(3), (1, 1, n)) * 0.1
        model = EnergyInstrumentModel(
            input_channels=1, model_channels=16, block_size=64, n_layers=1
        )
        ctrl = jnp.zeros((1, 1, n)).at[0, 0, ::128].set(0.5)
        params = model.init(jax.random.PRNGKey(0), ctrl)
        opt = optax.adam(1e-2)
        st = opt.init(params)

        def loss_fn(p):
            r = model.apply(p, ctrl)
            return jnp.abs(
                stft(r, 256, 128, pad=True) - stft(target, 256, 128, pad=True)
            ).sum()

        @jax.jit
        def step(p, st):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, st = opt.update(g, st, p)
            return optax.apply_updates(p, u), st, l

        l0 = None
        for _ in range(30):
            params, st, l = step(params, st)
            l0 = l0 if l0 is not None else float(l)
        assert float(l) < l0


def test_conv_upsample_learned_mode_doubles_exactly():
    """Regression: flax ConvTranspose with explicit [(1,1)] padding gives
    2*in - 2 per layer; learned mode must double exactly or every
    downstream reshape (GenerateImpulse, NoiseModel) breaks."""
    from mptpu.nn.upsample import ConvUpsample

    m = ConvUpsample(
        8, 16, start_size=4, end_size=64, mode="learned", out_channels=3
    )
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))
    out = m.apply(p, jnp.zeros((2, 8)))
    assert out.shape == (2, 3, 64)


def test_conv_impulse_event_generator_end_to_end():
    """Regression: the learned-upsampler fix unbroke this generator's
    GenerateImpulse path (reference ``eventgenerators/convimpulse.py:85``)."""
    from mptpu.gen.convimpulse import ConvImpulseEventGenerator

    m = ConvImpulseEventGenerator(
        context_dim=16, impulse_size=4096, resonance_size=8192,
        samplerate=22050, n_samples=2**13, n_events=1,
    )
    vecs = jax.random.normal(jax.random.PRNGKey(0), (1, 16)) * 0.1
    times = jnp.zeros((1, 1, 2**13 // 256)).at[0, 0, 3].set(1.0)
    p = m.init(jax.random.PRNGKey(0), vecs, times, jax.random.PRNGKey(1))
    out = m.apply(p, vecs, times, jax.random.PRNGKey(1))
    assert out.shape == (1, 1, 8192)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.sqrt(jnp.mean(out**2))) > 0


def test_generate_impulse_shapes():
    from mptpu.gen.impulse import GenerateImpulse

    m = GenerateImpulse(16, 32, 4096, 16, 1)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)), jax.random.PRNGKey(1))
    out = m.apply(p, jnp.zeros((1, 16)), jax.random.PRNGKey(1))
    assert out.shape == (1, 1, 4096)


class TestTextureFeatures:
    def test_kurtosis_matches_reference_formula(self):
        import torch
        from mptpu.perceptual.texture import calculate_kurtosis

        x = np.random.default_rng(0).standard_normal((2, 4, 256)).astype(np.float32)
        ours = np.asarray(calculate_kurtosis(jnp.asarray(x)))
        # reference texture.py:18-24 (torch.std is the unbiased estimator)
        t = torch.from_numpy(x)
        mean = torch.mean(t, dim=-1, keepdim=True)
        std = torch.std(t, dim=-1, keepdim=True)
        fourth = torch.mean((t - mean) ** 4, dim=-1, keepdim=True)
        theirs = (fourth / (std**4)) - 3
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-3, atol=1e-4)

    def test_statistics_matching_reduces_loss(self):
        import optax
        from mptpu.ops.norms import max_norm
        from mptpu.perceptual.texture import AudioTextureFeatures
        from mptpu.data.synthetic import synthetic_audio

        n = 2**12
        target = jnp.asarray(synthetic_audio(n, seed=11)).reshape(1, 1, n)
        feats = AudioTextureFeatures(n, n_filters=8, filter_size=64,
                                     min_band_size=512)
        tf = feats(target)
        assert np.isfinite(np.asarray(tf)).all()

        params = jax.random.normal(jax.random.PRNGKey(0), target.shape) * 0.01
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            def loss_fn(pp):
                return jnp.abs(feats(max_norm(pp)) - tf).sum()
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        losses = []
        for _ in range(25):
            params, opt_state, l = step(params, opt_state)
            losses.append(float(l))
        assert losses[-1] < losses[0] * 0.7
