"""Extra generator tests: goo simulation, recurrent synth, waveguide,
physical transfer functions, lookups, SIAMCodec."""

import numpy as np
import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


def test_goo_string_rings_and_stays_bounded():
    from mptpu.gen import string_mesh, goo_simulate, pluck_forces

    mesh = string_mesh(32)
    forces = pluck_forces(4096, 32, position=8)
    out = np.asarray(goo_simulate(mesh, forces))
    assert out.shape == (4096,)
    assert np.isfinite(out).all()
    assert np.abs(out[2000:]).max() > 1e-6  # still ringing
    assert np.abs(out).max() < 1e3          # but stable


def test_recurrent_synth():
    from mptpu.gen import RecurrentSynth

    m = RecurrentSynth(layers=2, channels=16, samples_per_frame=64, max_iter=4)
    x = jax.random.normal(KEY, (1, 16))
    params = m.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    out = m.apply(params, x, jax.random.PRNGKey(2))
    assert out.shape == (1, 1, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_waveguide_synth():
    from mptpu.gen import WaveguideSynth

    w = WaveguideSynth(max_delay=64, n_samples=1024)
    out = w(
        KEY,
        jax.random.normal(KEY, (2, 16)),
        jax.random.normal(jax.random.PRNGKey(1), (2, 64, 4)),
        jax.random.normal(jax.random.PRNGKey(2), (2, 1)),
        jax.random.normal(jax.random.PRNGKey(3), (2, 16)),
    )
    assert out.shape == (2, 1, 1024)
    assert np.isfinite(np.asarray(out)).all()


def test_transfer_function_segment_generator():
    from mptpu.gen import TransferFunctionSegmentGenerator

    m = TransferFunctionSegmentGenerator(
        model_dim=16, n_frames=8, window_size=64, n_samples=256
    )
    x = jax.random.normal(KEY, (2, 16))
    params = m.init(jax.random.PRNGKey(1), x, KEY)
    out = m.apply(params, x, KEY)
    assert out.shape[-1] == 256
    assert np.isfinite(np.asarray(out)).all()


def test_fft_resonance_lookup():
    from mptpu.gen.lookups import FFTResonanceLookup

    m = FFTResonanceLookup(
        n_items=8, n_samples=512, window_size=64, selection_type="relu"
    )
    sel = jax.nn.relu(jax.random.normal(KEY, (1, 2, 3, 8)))
    params = m.init(jax.random.PRNGKey(1), sel)
    out = m.apply(params, sel)
    assert out.shape == (1, 2, 3, 512)
    # unit-norm resonances
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-3
    )


def test_multissm_event_generator():
    from mptpu.gen.lookups import MultiSSM

    m = MultiSSM(
        context_dim=8,
        control_plane_dim=8,
        n_frames=16,
        state_dim=16,
        window_size=32,
        n_models=1,
        n_control_planes=4,
        n_samples=512,
    )
    choice = jax.random.normal(KEY, (1, 1, 4))
    times = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 16)) * 0.02
    params = m.init(jax.random.PRNGKey(2), choice, times)
    out = m.apply(params, choice, times)
    assert out.shape[-1] == 512
    assert np.isfinite(np.asarray(out)).all()


def test_siam_codec_round_trip():
    from mptpu.models import SIAMCodec
    from mptpu.models.siam import SIAMModel

    model = SIAMModel(
        n_samples=2**11, context_dim=8, in_channels=257, hidden_channels=16,
        n_events=2, transform_window_size=512, transform_step_size=256,
    )
    codec = SIAMCodec(model=model, checkpoint_dir=None)
    audio = jax.random.normal(KEY, (1, 1, 2**11)) * 0.1
    enc = codec.encode(audio)
    dec = codec.decode(enc)
    recon = codec.reconstruct(audio)
    assert dec.shape == (1, 1, 2**11)
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(recon), rtol=1e-3, atol=1e-5
    )
    assert codec.embed(audio).shape == (1, 16)


def test_event_variant_generators():
    from mptpu.gen import (
        AudioModelEventGenerator,
        WavetableModel,
        SimpleEventGenerator,
    )
    import numpy as np

    rng = np.random.default_rng(0)
    times = jnp.asarray(rng.standard_normal((1, 2, 16)).astype(np.float32) * 0.02)

    m = AudioModelEventGenerator(
        n_items=8, n_samples=1024, n_frames=16, n_events=2, context_dim=8
    )
    params_in = jnp.asarray(rng.standard_normal((1, 2, 8)).astype(np.float32))
    amp = jnp.ones((1, 2, 1))
    v = m.init(KEY, params_in, times, amp, KEY)
    out = m.apply(v, params_in, times, amp, KEY)
    assert out.shape == (1, 2, 1024)

    w = WavetableModel(
        n_items=4, n_samples=2048, n_frames=16, n_events=2, expressivity=2,
        wavetable_samples=2048, lowest_band=512,
    )
    p_in = {
        n: jnp.asarray(rng.standard_normal((1, 2) + s).astype(np.float32) * 0.1)
        for n, s in w.shape_spec.items()
    }
    v = w.init(KEY, p_in, times)
    out = w.apply(v, p_in, times)
    assert out.shape == (1, 2, 2048)

    s = SimpleEventGenerator(
        context_dim=8, n_frames=16, n_samples=1024, n_events=2, channels=16
    )
    v = s.init(KEY, params_in, times, KEY)
    out = s.apply(v, params_in, times, KEY)
    assert out.shape == (1, 2, 1024)
    assert np.isfinite(np.asarray(out)).all()
