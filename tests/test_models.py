"""Flagship model smoke tests (tiny shapes — single-core CPU CI)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

KEY = jax.random.PRNGKey(0)


class TestSplatOverfit:
    def test_render_and_one_grad_step(self):
        from mptpu.models import OverfitHierarchicalEvents, splat_loss_transform
        from mptpu.losses import iterative_loss

        n = 2**12
        model = OverfitHierarchicalEvents(
            n_samples=n, samplerate=22050, n_events=4, context_dim=8
        )
        params = model.init(KEY, KEY)
        rendered, vectors, times = model.apply(params, KEY)
        assert rendered.shape == (1, 4, n)
        assert vectors.shape == (1, 4, 8)
        assert np.isfinite(np.asarray(rendered)).all()

        target = jax.random.normal(jax.random.PRNGKey(1), (1, 1, n)) * 0.1

        def loss_fn(p, key):
            r, _, _ = model.apply(p, key)
            return iterative_loss(target, r, splat_loss_transform)

        loss, grads = jax.value_and_grad(loss_fn)(params, KEY)
        assert np.isfinite(float(loss))
        gnorm = optax.global_norm(grads)
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0


class TestSSMOverfit:
    def test_overfit_control_plane(self):
        from mptpu.models import OverfitControlPlane

        model = OverfitControlPlane(
            control_plane_dim=8,
            input_dim=16,
            state_matrix_dim=16,
            n_samples=512,
            window_size=16,
            n_active_sites=16,
        )
        params = model.init(KEY)
        audio, diff = model.apply(params)
        assert audio.shape == (1, 1, 512)
        assert np.isfinite(np.asarray(audio)).all()
        rand = model.apply(params, KEY, 0.01, method=OverfitControlPlane.random)
        assert rand.shape == (1, 1, 512)

    def test_ssm_loss_decreases(self):
        from mptpu.models import OverfitControlPlane
        from mptpu.losses import flattened_multiband_spectrogram

        model = OverfitControlPlane(
            control_plane_dim=8,
            input_dim=16,
            state_matrix_dim=16,
            n_samples=1024,
            window_size=16,
        )
        params = model.init(KEY)
        target = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1024)) * 0.1

        def transform(x):
            return flattened_multiband_spectrogram(
                x, stft_spec={"s": (64, 16)}, smallest_band_size=512
            )

        def loss_fn(p):
            audio, diff = model.apply(p)
            return jnp.abs(transform(audio) - transform(target)).sum()

        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        losses = []
        for _ in range(10):
            params, opt_state, l = step(params, opt_state)
            losses.append(float(l))
        assert losses[-1] < losses[0]


class TestSIAM:
    def test_iterative_decomposition_tiny(self):
        from mptpu.models.siam import SIAMModel

        model = SIAMModel(
            n_samples=2**12,
            context_dim=8,
            in_channels=257,
            hidden_channels=16,
            n_events=2,
            transform_window_size=512,
            transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 2**12)) * 0.1
        params = model.init(KEY, audio, KEY)
        channels, vecs, schedules = model.apply(params, audio, KEY)
        assert channels.shape == (1, 2, 2**12)
        assert vecs.shape == (1, 2, 8)
        assert schedules.shape == (1, 2, model.n_frames)
        assert np.isfinite(np.asarray(channels)).all()
        # the streaming trick: all events in the first half of frames
        sched = np.asarray(schedules)
        assert sched[:, :, model.n_frames // 2 :].sum() == 0

    def test_siam_gradients(self):
        from mptpu.models.siam import SIAMModel
        from mptpu.losses import iterative_loss
        from mptpu.models.siam import siam_transform

        model = SIAMModel(
            n_samples=2**11,
            context_dim=8,
            in_channels=257,
            hidden_channels=16,
            n_events=2,
            transform_window_size=512,
            transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 2**11)) * 0.1
        params = model.init(KEY, audio, KEY)

        def loss_fn(p):
            channels, _, _ = model.apply(p, audio, KEY)
            return iterative_loss(
                audio, channels, lambda x: siam_transform(x, 512, 256)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(optax.global_norm(grads)))

    def test_switch_blowup_guards_fix_nan_gradients(self):
        """Round-3 NaN root cause (BENCHMARKS.md): the gated encoder
        stack is a degree-256 polynomial of its input, so an exploded
        event-switch amplitude (measured 1.4e33 in the dense quality run)
        drives the residual spectrogram to e31 scale and the NEXT encode
        overflows to inf-inf = NaN. Reproduce the incident shape by
        scaling the switch head, then prove switch_clamp +
        residual_clamp_scale keep loss AND gradients finite while exact
        reference semantics (clamps off) produce non-finite gradients."""
        from mptpu.models.siam import SIAMModel, siam_transform
        from mptpu.losses import iterative_loss

        def build(**guards):
            return SIAMModel(
                n_samples=2**11,
                context_dim=8,
                in_channels=257,
                hidden_channels=16,
                n_events=3,
                transform_window_size=512,
                transform_step_size=256,
                fft_resonance=True,
                attn_floor=0.01,
                attn_leak=0.1,
                **guards,
            )

        model = build()
        audio = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 2**11)) * 0.1
        params = model.init(KEY, audio, KEY)
        # emulate the incident: the switch head emits astronomical
        # attention (the trained encoder reaches this state on ~7% of
        # batches through its own chaotic amplification). The fp
        # cancellation in sparsify_vectors' normalize (values + (1 -
        # values) == 0 in f32 at values ~1e9+, faithful to the torch
        # reference) zeroes the event VECTOR, so the decoder renders a
        # zero-latent event — give the multihead nonzero biases so that
        # event still makes audio, as the trained model does.
        params = jax.tree_util.tree_map(lambda x: x, params)  # copy
        sw = params["params"]["to_event_switch"]
        sw["kernel"] = sw["kernel"] * 1e12

        def bias_bump(d):
            for k, v in d.items():
                if isinstance(v, dict):
                    bias_bump(v)
                elif k == "bias":
                    d[k] = v + 0.05

        bias_bump(params["params"]["multihead"])

        def make_loss(m):
            def loss_fn(p):
                channels, _, _ = m.apply(p, audio, KEY)
                return iterative_loss(
                    audio,
                    channels,
                    lambda x: siam_transform(x, 512, 256, mag_epsilon=1e-6),
                )
            return loss_fn

        # exact reference semantics: the cascade produces non-finite grads
        loss0, grads0 = jax.value_and_grad(make_loss(model))(params)
        bad0 = not (
            np.isfinite(float(loss0))
            and np.isfinite(float(optax.global_norm(grads0)))
        )
        assert bad0, "incident failed to reproduce - guards untestable"

        # with the guards: finite loss and finite grads — the cascade
        # (huge scheduled event -> huge residual -> encoder overflow) is
        # cut at both links
        guarded = build(switch_clamp=100.0, residual_clamp_scale=4.0,
                        encoder_clamp=1e4)
        loss1, grads1 = jax.value_and_grad(make_loss(guarded))(params)
        assert np.isfinite(float(loss1))
        assert np.isfinite(float(optax.global_norm(grads1)))
        g_sw = grads1["params"]["to_event_switch"]["kernel"]
        assert np.isfinite(np.asarray(g_sw)).all()

    def test_silence_collapse_escape_needs_floor_and_leak(self):
        """Silence-collapse anatomy (BENCHMARKS.md SIAM notes): with every
        event-switch pre-activation negative the channels are EXACTLY
        silent, and the collapse is doubly terminal —

        - the smoothed magnitude sqrt(|z|^2 + eps^2) has zero derivative
          at z = 0, so silent channels get no loss gradient at all
          (attn_leak alone cannot help);
        - the relu backward is zero in the dead region, so even a
          non-silent channel's gradient cannot reach the switch
          (attn_floor alone cannot help).

        Only the combination revives the switch: the floor makes the
        channel (and thus the loss gradient) nonzero, and the
        straight-through leaky backward carries it through the relu."""
        import flax
        from mptpu.models.siam import SIAMModel, siam_transform
        from mptpu.losses import iterative_loss

        def switch_grad(attn_floor, attn_leak):
            model = SIAMModel(
                n_samples=2**11, context_dim=8, in_channels=257,
                hidden_channels=16, n_events=2,
                transform_window_size=512, transform_step_size=256,
                fft_resonance=True, attn_floor=attn_floor, attn_leak=attn_leak,
            )
            audio = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 2**11)) * 0.1
            params = model.init(KEY, audio, KEY)
            # force the dead-relu state: large negative switch bias
            flat = flax.traverse_util.flatten_dict(params)
            for path in flat:
                if "to_event_switch" in path and path[-1] == "bias":
                    flat[path] = flat[path] - 10.0
            params = flax.traverse_util.unflatten_dict(flat)

            def loss_fn(p):
                channels, _, _ = model.apply(p, audio, KEY)
                return iterative_loss(
                    audio, channels,
                    lambda x: siam_transform(x, 512, 256, mag_epsilon=1e-6),
                )

            grads = jax.grad(loss_fn)(params)
            gflat = flax.traverse_util.flatten_dict(grads)
            return sum(
                float(jnp.sum(jnp.abs(v)))
                for path, v in gflat.items()
                if "to_event_switch" in path
            )

        assert switch_grad(0.0, 0.0) == 0.0    # reference semantics: terminal
        assert switch_grad(0.0, 0.01) == 0.0   # leak alone: channel silent
        assert switch_grad(0.005, 0.0) == 0.0  # floor alone: relu dead
        assert switch_grad(0.005, 0.01) > 0.0  # both: gradient alive


class TestStreaming:
    def test_streaming_encode_tiny(self):
        from mptpu.models.siam import SIAMModel, streaming_encode

        model = SIAMModel(
            n_samples=2**11,
            context_dim=8,
            in_channels=257,
            hidden_channels=16,
            n_events=2,
            transform_window_size=512,
            transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2**12)) * 0.1
        params = model.init(KEY, audio[..., : 2**11], KEY)
        out = streaming_encode(model, params, audio, KEY)
        assert out.shape == (1, 1, 2**12)
        assert np.isfinite(np.asarray(out)).all()

    def test_streaming_fixed_noise_mode(self):
        """fixed_noise=True must feed the SAME key to every window —
        required to score --fixed-noise checkpoints, whose decoder
        memorizes one exact draw (the folded-key walk scored -1.8 dB on
        content the single-window eval scores at +4.37; see
        scripts/overfit_stream_eval.py)."""
        from mptpu.models.siam import SIAMModel, make_streaming_fn

        model = SIAMModel(
            n_samples=2**11, context_dim=8, in_channels=257,
            hidden_channels=16, n_events=2,
            transform_window_size=512, transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2**12)) * 0.1
        params = model.init(KEY, audio[..., : 2**11], KEY)
        stream = make_streaming_fn(model)
        folded = stream(params, audio, KEY)
        fixed = stream(params, audio, KEY, fixed_noise=True)
        assert np.isfinite(np.asarray(fixed)).all()
        # different noise draws -> different renders
        assert float(np.sum((np.asarray(folded) - np.asarray(fixed)) ** 2)) > 0

    def test_fade_tail_envelope(self):
        """fade_tail is the single definition of the codec's analysis
        window (trainers encode fade-tailed windows; decode paths must
        present windows identically — a drifted copy cost ~6 dB on the
        wire codec, BENCHMARKS.md)."""
        from mptpu.models.siam import fade_tail

        f = np.asarray(fade_tail(256))
        assert f.shape == (1, 1, 256)
        assert (f[..., :128] == 1.0).all()
        tail = f[0, 0, 128:]
        assert tail[0] == 1.0 and tail[-1] == 0.0
        assert (np.diff(tail) <= 0).all()  # monotone ramp
        # bit-identical to the trainers' literal construction
        # (scripts/siam_overfit.py; f32 jnp.linspace arithmetic)
        import jax.numpy as jnp
        ref = jnp.ones((1, 1, 256)).at[..., 128:].set(
            jnp.linspace(1.0, 0.0, 128) ** 8
        )
        assert np.array_equal(f, np.asarray(ref))

    def test_streaming_pristine_windows_mode(self):
        """pristine_windows=True encodes each window exactly as the
        trainers present it: a standalone fade-tailed time-domain slice
        with its own transform, no residual handoff. On the sw3
        checkpoint this recovered the train-eval number through the
        composed walk (5.78 -> 12.00 dB first-half; BENCHMARKS.md).
        Pin the mode's contract: finite output, same shape, and a
        DIFFERENT render from the residual walk (the two modes must
        not silently collapse into one another)."""
        from mptpu.models.siam import SIAMModel, make_streaming_fn

        model = SIAMModel(
            n_samples=2**11, context_dim=8, in_channels=257,
            hidden_channels=16, n_events=2,
            transform_window_size=512, transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2**12)) * 0.1
        params = model.init(KEY, audio[..., : 2**11], KEY)
        stream = make_streaming_fn(model)
        residual = stream(params, audio, KEY, fixed_noise=True)
        pristine = stream(
            params, audio, KEY, fixed_noise=True, pristine_windows=True
        )
        assert pristine.shape == residual.shape
        assert np.isfinite(np.asarray(pristine)).all()
        assert float(
            np.sum((np.asarray(residual) - np.asarray(pristine)) ** 2)
        ) > 0
        # the joint gain re-fit composes with pristine mode and, with
        # the all-ones gain vector in its feasible set, cannot lose to
        # it on the re-fit target
        tgt = audio
        refit = stream(
            params, audio, KEY, fixed_noise=True, pristine_windows=True,
            refit_gains_against=tgt, refit_ridge=1e-4,
        )
        err_raw = float(np.sum((np.asarray(tgt) - np.asarray(pristine)) ** 2))
        err_fit = float(np.sum((np.asarray(tgt) - np.asarray(refit)) ** 2))
        assert err_fit <= err_raw * (1 + 1e-3)

    def test_streaming_handoff_mode_matches_manual_walk(self):
        """The DEFAULT walk (round 4) is the time-domain residual
        handoff: window k encodes ``(audio_slice - decoded_so_far) *
        fade_tail`` with its own transform — the reference's
        later-windows-see-earlier-removals semantics
        (``iterativedecomposition.py:275-319``) with the subtraction
        done where it is exact. Verify against a hand-rolled walk built
        directly on make_iterative_fn, and that the first window (which
        has no predecessor) matches pristine mode bit-for-bit."""
        from mptpu.models.siam import (
            SIAMModel, fade_tail, make_iterative_fn, make_streaming_fn,
        )

        n = 2**11
        model = SIAMModel(
            n_samples=n, context_dim=8, in_channels=257,
            hidden_channels=16, n_events=2,
            transform_window_size=512, transform_step_size=256,
            fft_resonance=True,
            # a positive switch bias so the untrained model renders
            # NONZERO audio — a silent decode would make handoff,
            # spec, and pristine trivially identical
            switch_bias_init=1.0, attn_floor=0.1,
        )
        total = 2 * n
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 1, total)) * 0.1
        params = model.init(KEY, audio[..., :n], KEY)
        stream = make_streaming_fn(model)
        out, vecs, times, events = stream(
            params, audio, KEY, fixed_noise=True, return_event_vectors=True
        )
        assert out.shape == (1, 1, total)
        assert np.isfinite(np.asarray(out)).all()
        # hand-rolled reference walk
        iterative = make_iterative_fn(model)
        fade = fade_tail(n)
        half = n // 2
        decoded = np.zeros((1, 1, total + n), np.float32)
        manual = np.zeros((1, 1, total + n), np.float32)
        # same offsets as the jitted walk: frame step n_frames//2 over
        # the unpadded audio's frames
        offsets = list(range(0, total - n, half))
        for s in offsets:
            win = (
                jnp.asarray(audio[..., s:s + n])
                - jnp.asarray(decoded[..., s:s + n])
            ) * fade
            ch, _, _, _ = iterative(params, model.transform(win), KEY,
                                    do_transform=False)
            r = np.asarray(jnp.sum(ch, axis=1, keepdims=True))
            decoded[..., s:s + n] += r[0, 0]
            manual[..., s:s + n] += r[0, 0]
        # the jitted walk may tile one extra window over the end; the
        # covered region must agree
        covered = offsets[-1] + n
        np.testing.assert_allclose(
            np.asarray(out)[..., :covered], manual[..., :covered],
            rtol=1e-5, atol=1e-6,
        )
        # window 0 has no predecessor: handoff == pristine there
        pristine = stream(
            params, audio, KEY, fixed_noise=True, pristine_windows=True
        )
        np.testing.assert_allclose(
            np.asarray(out)[..., :half], np.asarray(pristine)[..., :half],
            rtol=1e-5, atol=1e-6,
        )
        # with a nonzero decode, later windows MUST differ from pristine
        assert float(np.sum(
            (np.asarray(out) - np.asarray(pristine))[..., half:] ** 2
        )) > 0


class TestGAN:
    def test_gan_steps_with_discriminator(self):
        import optax
        from mptpu.nn import DownsamplingDiscriminator
        from mptpu.train import make_gan_steps
        from mptpu.models import OverfitHierarchicalEvents

        n = 2**11
        gen = OverfitHierarchicalEvents(
            n_samples=n, samplerate=22050, n_events=2, context_dim=8
        )
        disc = DownsamplingDiscriminator(
            window_size=256, step_size=128, n_samples=n, channels=16
        )
        gp = gen.init(KEY, KEY)
        batch = jax.random.normal(jax.random.PRNGKey(6), (1, 1, n)) * 0.1
        dp = disc.init(jax.random.PRNGKey(7), batch)

        def gen_apply(p, batch, key):
            rendered, _, _ = gen.apply(p, key)
            return jnp.sum(rendered, axis=1, keepdims=True)

        def disc_apply(p, x):
            return disc.apply(p, x)

        g_opt = optax.adam(1e-4)
        d_opt = optax.adam(1e-4)
        train_gen, train_disc = make_gan_steps(gen_apply, disc_apply, g_opt, d_opt)
        gp2, gs, gl = train_gen(gp, g_opt.init(gp), dp, batch, KEY)
        dp2, ds, dl = train_disc(dp, d_opt.init(dp), gp, batch, KEY)
        assert np.isfinite(float(gl)) and np.isfinite(float(dl))


class TestEnvelopeDeadRelu:
    def test_envelope_relu_collapse_and_selection_leak(self):
        """Round-3 overfit collapse anatomy (siam_overfit2): the decoder's
        ONLY excitation is the Envelopes lookup, whose 'relu' selection
        (overfitresonance.py:347-355 here; reference
        overfitresonance.py:558-612) emits EXACTLY zero once every
        selection logit is negative. Every downstream op (noise filter,
        resonance convolution, reverb, scheduling) multiplies that zero,
        so the whole event is exactly silent AND every decoder gradient
        dies — both through the relu gate (zero backward) and through the
        multiplied zero (resonances/mixes/deformations all see d(out)=0).
        Observed in the run as loss frozen at 1997.42 with gnorm exactly
        0.0 while sched_max ~1 (the switch was alive; the envelope was
        dead). A leaky 'relu' selection (set_selection_leak) keeps the
        excitation and its gradients alive; 0.0 = reference semantics."""
        import flax
        from mptpu.models.siam import SIAMModel, siam_transform
        from mptpu.losses import iterative_loss
        from mptpu.sparse.quantize import set_selection_leak

        audio = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 2**11)) * 0.1

        def decoder_grads(leak):
            set_selection_leak(leak)
            try:
                model = SIAMModel(
                    n_samples=2**11, context_dim=8, in_channels=257,
                    hidden_channels=16, n_events=2,
                    transform_window_size=512, transform_step_size=256,
                    fft_resonance=True,
                    # switch alive (the overfit2 run's config): the
                    # collapse under test is strictly downstream of it
                    attn_floor=0.01, attn_leak=0.1, switch_bias_init=1.0,
                )
                params = model.init(KEY, audio, KEY)
                # force the dead state: every envelope-selection logit
                # negative (head output is unit-normed, so a -10 bias
                # with a zeroed final kernel lands all-negative)
                flat = flax.traverse_util.flatten_dict(params)
                for path in flat:
                    if "head_envelopes" in path:
                        if path[-1] == "bias":
                            flat[path] = flat[path] - 10.0
                        else:
                            flat[path] = flat[path] * 0.0
                params = flax.traverse_util.unflatten_dict(flat)

                def loss_fn(p):
                    channels, _, _ = model.apply(p, audio, KEY)
                    # waveform term included: even a phase-aware loss
                    # with nonzero d(loss)/d(recon) cannot reach any
                    # parameter through the multiplied zero
                    recon = jnp.sum(channels, axis=1, keepdims=True)
                    mag = iterative_loss(
                        audio, channels,
                        lambda x: siam_transform(x, 512, 256,
                                                 mag_epsilon=1e-6),
                    )
                    return mag + jnp.sum((recon - audio) ** 2), channels

                (_, channels), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                gflat = flax.traverse_util.flatten_dict(grads)
                dec = sum(
                    float(jnp.sum(jnp.abs(v)))
                    for path, v in gflat.items()
                    if "resonance" in path or "head_" in path
                    or "to_event_switch" in path
                )
                return np.asarray(channels), dec
            finally:
                set_selection_leak(0.0)

        channels0, g0 = decoder_grads(0.0)
        assert np.all(channels0 == 0.0)  # exactly silent, not just small
        assert g0 == 0.0                 # reference semantics: terminal

        channels1, g1 = decoder_grads(0.02)
        assert np.any(channels1 != 0.0)  # excitation alive
        assert g1 > 0.0                  # gradients alive

    def test_selection_floor_guarantees_audible_dead_events(self):
        """The forward-pass half of the fix (siam_overfit4 plateau,
        diag.json: 29/32 events at ~1e-6 energy after 3,000 steps WITH
        the leak on). The leak's forward render scales with |logits| —
        as dead logits drift toward 0⁻ the render vanishes, the greedy
        residual never changes, and every encode step re-picks the same
        frame/latent. An additive floor on 'relu' selection weights
        guarantees a logit-INDEPENDENT minimum render, so the greedy
        loop differentiates and real loss gradients reach dead events —
        the envelope-selection analogue of the event-switch attn_floor."""
        import flax
        from mptpu.models.siam import SIAMModel
        from mptpu.sparse.quantize import set_selection_leak, set_selection_floor

        audio = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 2**11)) * 0.1

        def render(leak, floor, dead_bias):
            set_selection_leak(leak)
            set_selection_floor(floor)
            try:
                model = SIAMModel(
                    n_samples=2**11, context_dim=8, in_channels=257,
                    hidden_channels=16, n_events=2,
                    transform_window_size=512, transform_step_size=256,
                    fft_resonance=True,
                    attn_floor=0.01, attn_leak=0.1, switch_bias_init=1.0,
                )
                params = model.init(KEY, audio, KEY)
                flat = flax.traverse_util.flatten_dict(params)
                for path in flat:
                    if "head_envelopes" in path:
                        if path[-1] == "bias":
                            flat[path] = flat[path] + dead_bias
                        else:
                            flat[path] = flat[path] * 0.0
                params = flax.traverse_util.unflatten_dict(flat)
                channels, _, _ = model.apply(params, audio, KEY)
                return np.asarray(channels)
            finally:
                set_selection_leak(0.0)
                set_selection_floor(0.0)

        # the observed death mode: logits just below zero, leak on —
        # render energy ~ (leak * |logit|)^2 ~ 1e-10 of a healthy event
        dead = render(0.02, 0.0, -1e-3)
        floored = render(0.02, 0.02, -1e-3)
        dead_e = float(np.sum(dead**2))
        floored_e = float(np.sum(floored**2))
        assert dead_e < 1e-6         # leak alone: inaudible
        assert floored_e > 1e3 * dead_e  # floor: logit-independent render
        per_event = np.sum(floored**2, axis=-1)[0]
        assert np.all(per_event > 0.0)


class TestRefitEventGains:
    """OMP-style joint amplitude re-projection (models/siam.py) —
    mirrors the amplitude re-fit inside the reference's dictionary
    update (``modules/matchingpursuit.py:269-328``)."""

    def test_never_worse_than_unit_gains(self):
        from mptpu.models.siam import refit_event_gains

        rng = np.random.default_rng(0)
        ch = jnp.asarray(rng.normal(size=(2, 6, 512)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(2, 1, 512)).astype(np.float32))
        gains = refit_event_gains(tgt, ch, ridge=1e-6)
        refit = jnp.einsum("be,ben->bn", gains, ch)
        unit = jnp.sum(ch, axis=1)
        err_refit = jnp.sum((tgt[:, 0] - refit) ** 2, axis=-1)
        err_unit = jnp.sum((tgt[:, 0] - unit) ** 2, axis=-1)
        assert np.all(np.asarray(err_refit) <= np.asarray(err_unit) + 1e-4)

    def test_recovers_exact_mixture_and_matches_numpy_lstsq(self):
        from mptpu.models.siam import refit_event_gains

        rng = np.random.default_rng(1)
        ch = rng.normal(size=(1, 5, 256)).astype(np.float32)
        true_g = rng.normal(size=(1, 5)).astype(np.float32)
        tgt = np.einsum("be,ben->bn", true_g, ch)[:, None]
        gains = np.asarray(
            refit_event_gains(jnp.asarray(tgt), jnp.asarray(ch), ridge=1e-9)
        )
        assert np.allclose(gains, true_g, atol=1e-2)
        ls, *_ = np.linalg.lstsq(ch[0].T, tgt[0, 0], rcond=None)
        assert np.allclose(gains[0], ls, atol=1e-2)

    def test_dead_channel_gets_zero_gain_and_span_restricts_fit(self):
        from mptpu.models.siam import refit_event_gains

        rng = np.random.default_rng(2)
        ch = rng.normal(size=(1, 3, 400)).astype(np.float32)
        ch[:, 1] = 0.0  # dead event: ridge must keep its gain finite ~0
        # second half of the target is garbage; span must ignore it
        tgt = np.einsum("be,ben->bn", np.ones((1, 3), np.float32), ch)[:, None]
        tgt[..., 200:] = 100.0
        gains = np.asarray(
            refit_event_gains(
                jnp.asarray(tgt), jnp.asarray(ch), ridge=1e-9, span=200
            )
        )
        assert np.isfinite(gains).all()
        assert abs(gains[0, 1]) < 1e-3
        assert np.allclose(gains[0, [0, 2]], 1.0, atol=1e-2)

    def test_gradients_flow_through_solve(self):
        from mptpu.models.siam import refit_event_gains

        rng = np.random.default_rng(3)
        ch = jnp.asarray(rng.normal(size=(1, 4, 128)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(1, 1, 128)).astype(np.float32))

        def loss(ch):
            g = refit_event_gains(tgt, ch, ridge=1e-3)
            recon = jnp.einsum("be,ben->bn", g, ch)
            return jnp.sum((tgt[:, 0] - recon) ** 2)

        grads = jax.grad(loss)(ch)
        assert np.isfinite(np.asarray(grads)).all()
        assert float(jnp.sum(jnp.abs(grads))) > 0.0

    def test_streaming_refit_never_worse(self):
        """The streaming walk's OMP gain re-fit (refit_gains_against)
        must not raise waveform error vs the plain walk: unit gains are
        in its feasible set (models/siam.py refit_event_gains)."""
        from mptpu.models.siam import SIAMModel, make_streaming_fn

        model = SIAMModel(
            n_samples=2**11, context_dim=8, in_channels=257,
            hidden_channels=16, n_events=2,
            transform_window_size=512, transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2**12)) * 0.1
        params = model.init(KEY, audio[..., : 2**11], KEY)
        stream = make_streaming_fn(model)
        plain = stream(params, audio, KEY, fixed_noise=True)
        refit = stream(
            params, audio, KEY, fixed_noise=True,
            refit_gains_against=audio, refit_ridge=1e-6,
        )
        assert refit.shape == plain.shape
        tgt = np.asarray(audio)
        err_plain = float(np.sum((tgt - np.asarray(plain)) ** 2))
        err_refit = float(np.sum((tgt - np.asarray(refit)) ** 2))
        assert np.isfinite(err_refit)
        assert err_refit <= err_plain * (1 + 1e-4)


class TestRefineEventAlignment:
    """Shift+gain coordinate descent (models/siam.py) — fixes the
    frame-quantized placement phase error the encoder's attention
    cannot express (reference places at frame resolution,
    ``iterativedecomposition.py:340-390``)."""

    def test_recovers_known_shifts_and_gains(self):
        from mptpu.models.siam import refine_event_alignment

        rng = np.random.default_rng(0)
        n, e = 4096, 4
        base = rng.normal(size=(1, e, n)).astype(np.float32)
        true_shift = np.array([[7, -120, 33, 0]])
        true_gain = np.array([[1.5, -0.7, 2.0, 0.9]], np.float32)
        tgt = np.zeros((1, n), np.float32)
        for i in range(e):
            tgt += true_gain[0, i] * np.roll(base[0, i], true_shift[0, i])
        refined, shifts, gains = refine_event_alignment(
            jnp.asarray(tgt[:, None]), jnp.asarray(base),
            max_shift=128, n_iters=3, ridge=1e-9,
        )
        recon = np.einsum("be,ben->bn", np.asarray(gains), np.asarray(refined))
        err = np.sum((tgt - recon) ** 2) / np.sum(tgt**2)
        snr = -10 * np.log10(err + 1e-12)
        assert snr > 30.0, snr
        assert np.array_equal(np.asarray(shifts), true_shift), shifts

    def test_monotone_improvement_over_raw_sum(self):
        from mptpu.models.siam import refine_event_alignment

        rng = np.random.default_rng(1)
        ch = jnp.asarray(rng.normal(size=(2, 5, 1024)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(2, 1, 1024)).astype(np.float32))
        refined, _, gains = refine_event_alignment(
            tgt, ch, max_shift=64, n_iters=2, ridge=1e-9
        )
        recon = jnp.einsum("be,ben->bn", gains, refined)
        err_after = np.asarray(jnp.sum((tgt[:, 0] - recon) ** 2, axis=-1))
        err_before = np.asarray(
            jnp.sum((tgt[:, 0] - jnp.sum(ch, axis=1)) ** 2, axis=-1)
        )
        assert np.all(err_after <= err_before + 1e-4)
        assert np.isfinite(err_after).all()

    def test_streaming_align_refine_never_worse_than_refit(self):
        from mptpu.models.siam import SIAMModel, make_streaming_fn

        model = SIAMModel(
            n_samples=2**11, context_dim=8, in_channels=257,
            hidden_channels=16, n_events=2,
            transform_window_size=512, transform_step_size=256,
            fft_resonance=True,
        )
        audio = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 2**12)) * 0.1
        params = model.init(KEY, audio[..., : 2**11], KEY)
        stream = make_streaming_fn(model)
        refit = stream(
            params, audio, KEY, fixed_noise=True,
            refit_gains_against=audio, refit_ridge=1e-6,
        )
        aligned = stream(
            params, audio, KEY, fixed_noise=True,
            refit_gains_against=audio, refit_ridge=1e-6, align_refine=32,
        )
        tgt = np.asarray(audio)
        err_refit = float(np.sum((tgt - np.asarray(refit)) ** 2))
        err_aligned = float(np.sum((tgt - np.asarray(aligned)) ** 2))
        assert np.isfinite(err_aligned)
        assert err_aligned <= err_refit * (1 + 1e-4)


class TestTrustRatioClip:
    """mptpu.train.trust_ratio_clip — the round-4 divergence-storm bound
    (BENCHMARKS.md "optimizer-knob A/B"; the reference merely skips
    non-finite steps, iterativedecomposition.py:535-540)."""

    def test_oversized_update_clipped_to_ratio_times_param_norm(self):
        from mptpu.train import trust_ratio_clip

        clip = trust_ratio_clip(0.1)
        params = {"w": jnp.ones((4, 4))}
        updates = {"w": jnp.full((4, 4), 100.0)}
        out, _ = clip.update(updates, clip.init(params), params)
        un = float(jnp.linalg.norm(out["w"].ravel()))
        pn = float(jnp.linalg.norm(params["w"].ravel()))
        np.testing.assert_allclose(un, 0.1 * pn, rtol=1e-5)

    def test_small_update_passes_through_unchanged(self):
        from mptpu.train import trust_ratio_clip

        clip = trust_ratio_clip(0.1)
        params = {"w": jnp.ones((4, 4))}
        updates = {"w": jnp.full((4, 4), 1e-3)}
        out, _ = clip.update(updates, clip.init(params), params)
        np.testing.assert_array_equal(np.asarray(out["w"]),
                                      np.asarray(updates["w"]))

    def test_zero_init_leaf_is_not_frozen(self):
        # the naive ||p||/||u|| form froze every zero-init bias forever;
        # the floored form lets it take floor-scaled steps whose cap then
        # grows with the leaf (~40 steps from 1e-3 to 1)
        from mptpu.train import trust_ratio_clip

        clip = trust_ratio_clip(0.1, floor=1e-3)
        p = jnp.zeros((8,))
        state = clip.init({"b": p})
        for _ in range(5):
            out, state = clip.update({"b": jnp.ones((8,))}, state, {"b": p})
            assert float(jnp.linalg.norm(out["b"])) > 0.0
            p = p + out["b"]
        assert float(jnp.linalg.norm(p)) > 1e-4

    def test_chains_with_adam(self):
        import optax
        from mptpu.train import trust_ratio_clip

        opt = optax.chain(optax.adam(1e-2), trust_ratio_clip(0.1))
        params = {"w": jnp.ones((3,))}
        state = opt.init(params)
        g = {"w": jnp.full((3,), 5.0)}
        updates, state = opt.update(g, state, params)
        new = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(new["w"])))
        un = float(jnp.linalg.norm(updates["w"].ravel()))
        pn = float(jnp.linalg.norm(params["w"].ravel()))
        assert un <= 0.1 * pn * (1 + 1e-5)
