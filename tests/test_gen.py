"""Event-generator zoo smoke + property tests (small shapes)."""

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.gen import (
    DiracScheduler,
    FFTShiftScheduler,
    HierarchicalDiracModel,
    hierarchical_dirac,
    make_waves,
    make_waves_vectorized,
    freq_domain_transfer_function_to_resonance,
    damped_harmonic_oscillator,
    state_space_model,
    exponential_decay,
    SplattingEventGenerator,
    F0Resonance,
)
from mptpu.gen.reverb import NeuralReverb, load_impulse_responses

RNG = np.random.default_rng(0)
KEY = jax.random.PRNGKey(0)


class TestSchedulers:
    def test_dirac_scheduler_places_events(self):
        sched = DiracScheduler(n_events=2, start_size=16, n_samples=256)
        pos = sched.init_params(KEY)
        events = jnp.asarray(
            RNG.standard_normal((1, 2, 256)).astype(np.float32)
        )
        out = sched.schedule(pos, events)
        assert out.shape == (1, 2, 256)

    def test_hierarchical_dirac_is_one_hot(self):
        elements = jnp.asarray(
            RNG.standard_normal((1, 3, 5, 2)).astype(np.float32)
        )
        out = np.asarray(hierarchical_dirac(elements))
        assert out.shape == (1, 3, 32)
        np.testing.assert_allclose(out.sum(axis=-1), 1.0, rtol=1e-4, atol=1e-5)
        assert (np.isclose(out, 0, atol=1e-6) | np.isclose(out, 1, atol=1e-4)).all()

    def test_hierarchical_dirac_many_dims(self):
        for shape in [(4, 2), (2, 3, 4, 2), (1, 2, 3, 4, 2)]:
            elements = jnp.asarray(
                RNG.standard_normal(shape).astype(np.float32)
            )
            out = hierarchical_dirac(elements)
            assert out.shape == shape[:-2] + (2 ** shape[-2],)

    def test_fft_shift_scheduler(self):
        sched = FFTShiftScheduler(n_events=2)
        pos = sched.init_params(KEY)
        events = jnp.asarray(RNG.standard_normal((1, 2, 128)).astype(np.float32))
        out = sched.schedule(pos, events)
        assert out.shape == (1, 2, 128)


class TestWaves:
    def test_make_waves_matches_vectorized(self):
        f0s = [110.0, 220.0, 440.0]
        a = np.asarray(make_waves(256, f0s, 22050))
        b = np.asarray(make_waves_vectorized(256, np.asarray(f0s), 22050))
        assert a.shape == b.shape == (12, 256)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestResonance:
    def test_freq_domain_resonance_decays(self):
        coeffs = jnp.full((2, 33), 0.5)  # strong decay
        audio = freq_domain_transfer_function_to_resonance(64, coeffs, 16)
        assert audio.shape == (2, 1, 32 * 16)
        x = np.asarray(audio)[0, 0]
        early = np.abs(x[:64]).max()
        late = np.abs(x[-64:]).max()
        assert late < early

    def test_dho_closed_form(self):
        t = jnp.linspace(0, 10, 100)
        z = damped_harmonic_oscillator(
            time=t,
            mass=jnp.asarray(1.0),
            damping=jnp.asarray(0.5),
            tension=jnp.asarray(100.0),
            initial_displacement=jnp.asarray(1.0),
            initial_velocity=0.0,
        )
        x = np.asarray(z)
        assert abs(x[0] - 1.0) < 1e-4  # starts at initial displacement
        assert np.abs(x[-10:]).max() < np.abs(x[:10]).max()  # decays

    def test_exponential_decay_monotone(self):
        out = np.asarray(
            exponential_decay(
                jnp.asarray([[0.0]]), n_atoms=1, n_frames=8,
                base_resonance=0.1, n_samples=64,
            )
        )
        assert (np.diff(out[0, 0]) <= 1e-6).all()

    def test_f0_resonance_shapes(self):
        gen = F0Resonance(n_octaves=4, n_samples=512)
        f0 = jnp.asarray(RNG.uniform(0, 1, (1, 3, 1)).astype(np.float32))
        decay = jnp.asarray(RNG.uniform(0, 1, (1, 3, 1)).astype(np.float32))
        spacing = jnp.ones((1, 3, 1))
        out = gen(f0, decay, spacing)
        assert out.shape == (1, 3, 512)
        assert np.isfinite(np.asarray(out)).all()


class TestSSM:
    def test_state_space_model_shapes(self):
        control = jnp.asarray(
            RNG.standard_normal((2, 8, 16)).astype(np.float32) * 0.1
        )
        out = state_space_model(
            control,
            proj_matrix=jnp.asarray(RNG.standard_normal((8, 32)).astype(np.float32) * 0.01),
            state_matrix=jnp.asarray(RNG.standard_normal((16, 16)).astype(np.float32) * 0.01),
            input_matrix=jnp.asarray(RNG.standard_normal((32, 16)).astype(np.float32) * 0.01),
            output_matrix=jnp.asarray(RNG.standard_normal((16, 32)).astype(np.float32) * 0.01),
            direct_matrix=jnp.asarray(RNG.standard_normal((32, 32)).astype(np.float32) * 0.01),
            state_matrix_dim=16,
            input_dim=32,
            n_samples=16 * 16,
        )
        assert out.shape == (2, 1, 256)
        assert np.isfinite(np.asarray(out)).all()


class TestReverb:
    def test_synthetic_rooms_and_convolution(self):
        rooms = load_impulse_responses(None, 512, n_fallback_rooms=4)
        assert rooms.shape == (4, 512)
        verb = NeuralReverb(512, 4, impulses=rooms)
        x = jnp.asarray(RNG.standard_normal((2, 3, 512)).astype(np.float32))
        mix = jax.nn.softmax(jnp.asarray(RNG.standard_normal((2, 4))), axis=-1)
        out = verb.apply({"params": {}}, x, mix)
        assert out.shape == (2, 3, 512)


class TestSplat:
    def test_splat_generator_end_to_end(self):
        gen = SplattingEventGenerator(
            n_samples=2048,
            samplerate=22050,
            n_resonance_octaves=4,
            n_frames=8,
        )
        spec = gen.shape_spec
        assert "env" in spec and "verb_params" in spec
        params_in = {
            name: jnp.asarray(
                RNG.standard_normal((1, 2) + shape).astype(np.float32) * 0.1
            )
            for name, shape in spec.items()
        }
        times = jnp.asarray(
            RNG.standard_normal((1, 2, 2048 // 256)).astype(np.float32) * 0.02
        )
        variables = gen.init(KEY, params_in, times, KEY)
        out = gen.apply(variables, params_in, times, KEY)
        assert out.shape == (1, 2, 2048)
        assert np.isfinite(np.asarray(out)).all()
