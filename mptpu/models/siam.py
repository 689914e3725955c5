"""SIAM iterative decomposition codec — the flagship model (BASELINE
config #4).

Capability parity with reference ``iterativedecomposition.py:110-375``:
an anti-causal dilated-conv encoder emits one (event vector, scheduling)
pair per step; the ``OverfitResonanceModel`` decoder renders it; the
residual spectrogram (stop-gradient) feeds the next step. 32 steps of
encode -> generate -> subtract, then the greedy ``iterative_loss``.

TPU design notes:
- the 32-step loop is ``lax.scan`` over shared encoder/decoder params
  (reference has a python loop re-running the same modules,
  ``iterativedecomposition.py:340-349``); ``stop_gradient`` reproduces
  ``.clone().detach()`` semantics on the residual carry.
- the per-batch-item scheduling scatter (``:223-226``) is vmapped.
- streaming encode (``:275-319``) keeps the reference's half-overlap
  window walk as a host loop around the jitted per-window program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.stft import stft
from ..ops.fft import rfft, irfft
from ..ops.refit import refit_gains
from ..ops.ste import sparse_softmax, leaky_relu_ste
from ..sparse.topk import sparsify, sparsify_vectors
from ..nn.anticausal import AntiCausalAnalysis
from ..nn.multihead import MultiHeadTransform
from ..nn.init import uniform_init
from ..gen.overfitresonance import OverfitResonanceModel


def siam_transform(
    x: jax.Array,
    window_size: int = 2048,
    step_size: int = 256,
    mag_epsilon: float = 0.0,
) -> jax.Array:
    """Audio -> (batch, n_coeffs, frames) magnitude STFT (the reference's
    module-level ``transform``, ``iterativedecomposition.py:75-82``).

    ``mag_epsilon`` > 0 smooths |z| so the training gradient survives a
    silence-collapsed generator (see ops/stft.py)."""
    batch = x.shape[0]
    n_coeffs = window_size // 2 + 1
    spec = stft(x, window_size, step_size, pad=True, mag_epsilon=mag_epsilon)
    spec = spec.reshape(batch, -1, n_coeffs)
    return jnp.transpose(spec, (0, 2, 1))


_MEL_CACHE: dict = {}


def _mel_basis(n_bins: int, n_bands: int, samplerate: int = 22050):
    """Fixed log-spaced triangular filterbank (n_bands, n_bins) over the
    analysis band [0, sr/2]; rows l1-normalized. Static conditioning
    feature for ``SIAMModel.spectral_filter`` — computed once, cached."""
    key = (n_bins, n_bands, samplerate)
    if key not in _MEL_CACHE:
        freqs = np.linspace(0.0, samplerate / 2.0, n_bins)
        lo, hi = 30.0, samplerate / 2.0
        edges = np.geomspace(lo, hi, n_bands + 2)
        basis = np.zeros((n_bands, n_bins), np.float32)
        for b in range(n_bands):
            l, c, r = edges[b], edges[b + 1], edges[b + 2]
            up = (freqs - l) / max(c - l, 1e-6)
            down = (r - freqs) / max(r - c, 1e-6)
            tri = np.clip(np.minimum(up, down), 0.0, None)
            s = tri.sum()
            basis[b] = tri / (s if s > 0 else 1.0)
        # cache HOST numpy (a jnp array created under a trace would leak
        # its tracer into later calls); jnp.asarray at the use site is a
        # free constant under jit
        _MEL_CACHE[key] = basis
    return jnp.asarray(_MEL_CACHE[key])


class SIAMModel(nn.Module):
    """Encoder + multihead + resonance decoder (reference ``Model``,
    ``iterativedecomposition.py:129-375``)."""

    n_samples: int = 2**17
    samplerate: int = 22050
    context_dim: int = 32
    in_channels: int = 1025
    hidden_channels: int = 128
    n_events: int = 32
    transform_window_size: int = 2048
    transform_step_size: int = 256
    with_activation_norm: bool = False
    fft_resonance: bool = True
    # optional floor added to the selected event's amplitude so gradients
    # survive the all-negative-attention (dead ReLU) cold start; 0.0 keeps
    # exact reference semantics (relu attn can collapse to silence)
    attn_floor: float = 0.0
    # straight-through leaky backward for the attention relu: forward is
    # bit-identical to the reference; the backward slope keeps gradients
    # alive through the dead-relu region so the energy-removal loss's
    # silence local optimum is escapable (see BENCHMARKS.md SIAM notes).
    # 0.0 = plain relu gradient (exact reference backward)
    attn_leak: float = 0.0
    # initial bias of the event-switch head. The reference inits it to 0,
    # which puts the attention relu exactly on its dead/alive boundary at
    # step 0; the energy-removal loss then drives it dead within ~100
    # steps (the silence collapse, BENCHMARKS.md) and revival via the
    # leak takes thousands of steps. A positive init starts the switch
    # alive so amplitude gradients flow from step 0 — an init-only
    # deviation used by the overfit existence-proof runs.
    switch_bias_init: float = 0.0
    # --- NaN-blowup guards (root-caused in round 3, BENCHMARKS.md) ---
    # The gated encoder block (conv(x) * selu(gate(x)) + x,
    # anticausal.py:28-66) is quadratic per block, so the 8-block stack is
    # a degree-256 polynomial of its input: on ~7% of trained-model steps
    # the event-switch head emits astronomically large attention (measured
    # 1.4e33), the scheduled event inherits it, and the residual subtract
    # feeds an e31-scale spectrogram to the next encode, which overflows
    # to inf-inf = NaN. The reference shares the architecture and merely
    # skips such steps via its loss guard (iterativedecomposition.py:
    # 535-540). Two surgical guards fix the source:
    # switch_clamp > 0: cap the selected event amplitude at this value
    #   with a STRAIGHT-THROUGH min — forward is bit-identical whenever
    #   sel <= clamp (the healthy regime is sel ~ 0-5), and the identity
    #   backward lets the loss keep pushing an exploded switch DOWN
    #   (a plain min has zero gradient above the cap).
    switch_clamp: float = 0.0
    # residual_clamp_scale > 0: clip the (stop-gradient) residual carry to
    #   +/- scale * max|initial spec| per item. A sane codec's residual
    #   never exceeds the target's own magnitude, so this is a no-op in
    #   healthy training; after a blowup it bounds what the next encode
    #   sees, converting a NaN cascade into a finite, learnable penalty.
    residual_clamp_scale: float = 0.0
    # encoder_clamp > 0: per-block straight-through activation clip inside
    #   the gated encoder stack (see AntiCausalBlock.activation_clamp) —
    #   the degree-256 polynomial can overflow f32 INTERNALLY once its
    #   weights grow, which the two guards above cannot prevent.
    encoder_clamp: float = 0.0
    # spectral_skip: condition each event's generator DIRECTLY on the
    # residual spectrogram around the selected frame, additively mixed
    # into the event vector. Round-5 architecture A/B motivated by the
    # holdout event-anatomy probe (trained_weights/siam_quality_anat/
    # anatomy.json): on unseen audio the rendered event waveforms
    # correlate with the residual at CHANCE level (rho_max 0.026 vs
    # chance 0.033) and their oracle-placement SNR ceiling is 0.06 dB —
    # the generator is a function of a 32-dim code reached only through
    # the deep gated-conv stack, and that path learns no content
    # mapping at this scale/step budget. The skip gives the decoder's
    # SpectralResonance a LINEAR image of the local residual spectrum
    # (pitch/timbre) that needs no deep credit assignment. Documented
    # deviation from the reference (which has no such path,
    # iterativedecomposition.py:192-228) — off by default.
    spectral_skip: bool = False
    # spectral_filter: additionally shape each generated event with a
    # ZERO-PHASE spectral envelope computed from the same residual
    # column (source-filter with an analysis-driven filter). The A/B of
    # spectral_skip alone (siam_quality_anatB) left holdout event
    # waveforms at chance correlation: conditioning through the 32-dim
    # vector still requires the latent->spectrum map to LEARN the
    # content mapping. The filter needs no learning to first order: the
    # per-bin gate is initialized to identity (softplus bias) and a
    # linear layer from the signed-log residual column nudges it, so the
    # event's magnitude spectrum can track local content directly.
    # Requires spectral_skip (reuses its gathered column). Off by
    # default; documented deviation from the reference.
    spectral_filter: bool = False
    # vec_clamp > 0: straight-through clip of the EVENT VECTOR at
    # +/- this value. sw6 forensics (round 5): on window-1 content the
    # encoder emitted event vectors with max |v| ~ 700 (healthy windows:
    # O(0.3-1)) while the switch rode its clamp — the forward stayed
    # finite (switch_clamp/encoder_clamp) but every BACKWARD through
    # the saturated decoder path went inf, so the ok-gate skipped every
    # window-1 update and the window could never gradient-heal (a
    # catch-22 the rollback machinery cannot fix). The STE clip bounds
    # the decoder's input scale (finite backward) while the identity
    # backward still lets the loss pull a saturated vector DOWN. 0 =
    # exact reference semantics (no such clamp exists upstream).
    vec_clamp: float = 0.0

    @property
    def n_frames(self) -> int:
        return self.n_samples // self.transform_step_size

    def transform(self, x: jax.Array) -> jax.Array:
        return siam_transform(
            x, self.transform_window_size, self.transform_step_size
        )

    def setup(self):
        self.encoder = AntiCausalAnalysis(
            in_channels=self.in_channels,
            channels=self.hidden_channels,
            kernel_size=2,
            dilations=[1, 2, 4, 8, 16, 32, 64, 1],
            pos_encodings=False,
            do_norm=False,
            with_activation_norm=self.with_activation_norm,
            activation_clamp=self.encoder_clamp,
        )
        self.to_event_vectors = nn.Dense(
            self.context_dim, kernel_init=uniform_init(0.02)
        )
        self.to_event_switch = nn.Dense(
            1,
            kernel_init=uniform_init(0.02),
            bias_init=nn.initializers.constant(self.switch_bias_init),
        )
        self.resonance = OverfitResonanceModel(
            n_noise_filters=32,
            noise_expressivity=8,
            noise_filter_samples=128,
            noise_deformations=16,
            instr_expressivity=8,
            n_events=1,
            n_resonances=4096,
            n_envelopes=64,
            n_deformations=64,
            n_samples=self.n_samples,
            n_frames=self.n_frames,
            samplerate=self.samplerate,
            hidden_channels=self.hidden_channels,
            context_dim=self.context_dim,
            fine_positioning=True,
            fft_resonance=self.fft_resonance,
        )
        self.multihead = MultiHeadTransform(
            latent_dim=self.context_dim,
            hidden_channels=self.hidden_channels,
            n_layers=2,
            shapes=self.resonance.shape_spec,
        )
        if self.spectral_skip:
            self.spec_skip_proj = nn.Dense(
                self.context_dim, kernel_init=uniform_init(0.02)
            )
        if self.spectral_filter:
            # per-bin gate over the analysis band [0, sr/2]: zeros kernel
            # + softplus(bias)=1 makes the filter an exact identity at
            # init, so enabling it cannot regress the untrained model
            self.spec_filter_gate = nn.Dense(
                self.in_channels,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.constant(0.5413248546),
            )

    def encode(self, transformed: jax.Array):
        """One event per call: returns (vecs (b, 1, context), scheduling
        (b, 1, frames)) — reference ``:192-228`` including the
        second-half attention mask (the streaming trick)."""
        batch_size = transformed.shape[0]
        encoded = self.encoder(transformed)  # (batch, hidden, frames)

        ev_in = jnp.transpose(encoded, (0, 2, 1))
        event_vecs = self.to_event_vectors(ev_in)  # (batch, time, context)
        switch = self.to_event_switch(ev_in)
        if self.attn_leak:
            attn = leaky_relu_ste(switch, self.attn_leak)
        else:
            attn = jax.nn.relu(switch)
        attn = attn.reshape(batch_size, 1, -1)

        frame_count = attn.shape[-1]
        half = frame_count // 2
        mask = jnp.ones_like(attn).at[:, :, half:].set(0.0)
        attn = attn * mask

        attn, attn_indices, _ = sparsify(attn, n_to_keep=1, return_indices=True)
        vecs, indices = sparsify_vectors(
            jnp.transpose(event_vecs, (0, 2, 1)), attn, n_to_keep=1
        )
        if self.vec_clamp:
            from ..ops.ste import straight_through

            vecs = straight_through(
                jnp.clip(vecs, -self.vec_clamp, self.vec_clamp), vecs
            )
        if self.spectral_skip:
            # linear image of the residual spectrum AT the selected
            # frame (one STFT column already spans window_size samples),
            # signed-log compressed (the residual spec is a signed
            # magnitude difference), added to the event vector — see the
            # spectral_skip field docstring for the probe evidence
            col = jnp.take_along_axis(
                transformed, indices[:, :, None], axis=2
            )[:, :, 0]  # (b, in_channels)
            col = jnp.sign(col) * jnp.log1p(jnp.abs(col))
            vecs = vecs + self.spec_skip_proj(col)[:, None, :]
        # scheduling[b, 0, indices[b]] = attn[b, 0, indices[b]]
        sel = jnp.take_along_axis(attn[:, 0, :], indices, axis=-1)  # (b, 1)
        if self.attn_floor:
            sel = sel + self.attn_floor
        if self.switch_clamp:
            from ..ops.ste import straight_through

            sel = straight_through(jnp.minimum(sel, self.switch_clamp), sel)
        scheduling = jnp.zeros((batch_size, 1, frame_count), attn.dtype)
        scheduling = jax.vmap(
            lambda s, i, v: s.at[0, i].set(v)
        )(scheduling, indices[:, 0], sel[:, 0])
        return vecs, scheduling

    def generate(
        self,
        vecs: jax.Array,
        scheduling: jax.Array,
        key: jax.Array,
        spec: Optional[jax.Array] = None,
        spec_feat: Optional[jax.Array] = None,
    ):
        choices = self.multihead(vecs)
        ch = self.resonance(choices, scheduling, key)
        if self.spectral_filter and (
            spec is not None or spec_feat is not None
        ):
            # analysis-driven source-filter stage (see the
            # spectral_filter field docstring): shape the event with a
            # zero-phase envelope computed from a 64-band log-mel
            # summary of the residual spectrum at the event's frame. The
            # conditioning path is mel(64) -> linear gate, so content
            # (pitch band, brightness) reaches the rendered magnitude
            # without deep credit assignment; identity at init.
            # At DECODE the residual does not exist: the wire carries
            # the 64-band feature itself (spec_feat — computed by
            # spectral_feat() at encode, ~64 int8 per event after
            # quantization), keeping the codec contract honest.
            if spec_feat is None:
                spec_feat = SIAMModel.spectral_feat_static(
                    spec, scheduling, self.in_channels
                )
            env = jax.nn.softplus(self.spec_filter_gate(spec_feat))
            n_bins = self.n_samples // 2 + 1
            env_full = jax.image.resize(
                env, (env.shape[0], n_bins), "linear"
            )
            X = rfft(ch, n=self.n_samples)
            ch = irfft(X * env_full[:, None, :], n=self.n_samples)
        return ch

    @staticmethod
    def spectral_feat_static(
        spec: jax.Array, scheduling: jax.Array, in_channels: int
    ) -> jax.Array:
        """The 64-band log-mel conditioning feature of ``spectral_filter``
        for one event: residual spec (b, C, F) + its one-hot scheduling
        (b, 1, F) -> (b, 64). This is what the wire transmits per event
        when the filter is part of the codec."""
        idx = jnp.argmax(scheduling[:, 0, :], axis=-1)
        col = jnp.take_along_axis(spec, idx[:, None, None], axis=2)[:, :, 0]
        return jnp.log1p(jnp.abs(col) @ _mel_basis(in_channels, 64).T)

    def iterative(
        self,
        audio_or_spec: jax.Array,
        key: jax.Array,
        do_transform: bool = True,
        return_residual: bool = False,
    ):
        """n_events steps of encode/generate/subtract (reference
        ``:321-371``). Returns (channels (b, E, n), vecs (b, E, C),
        schedules (b, E, F)[, residual spec])."""
        spec = self.transform(audio_or_spec) if do_transform else audio_or_spec
        bound = None
        if self.residual_clamp_scale:
            bound = self.residual_clamp_scale * jnp.max(
                jnp.abs(spec), axis=(-2, -1), keepdims=True
            )

        channels, vecs, schedules = [], [], []
        for i in range(self.n_events):
            v, sched = self.encode(spec)
            ch = self.generate(v, sched, jax.random.fold_in(key, i), spec=spec)
            current = self.transform(ch)
            spec = lax.stop_gradient(spec - current)
            if bound is not None:
                spec = jnp.clip(spec, -bound, bound)
            channels.append(ch)
            vecs.append(v)
            schedules.append(sched)

        channels = jnp.concatenate(channels, axis=1)
        vecs = jnp.concatenate(vecs, axis=1)
        schedules = jnp.concatenate(schedules, axis=1)
        if return_residual:
            return channels, vecs, schedules, spec
        return channels, vecs, schedules

    def __call__(self, audio: jax.Array, key: jax.Array):
        return self.iterative(audio, key)


def make_iterative_fn(model: SIAMModel):
    """Scan-based iterative decomposition with shared weights.

    The module's ``iterative`` unrolls the n_events python loop — fine for
    small models, but at the reference scale (32 events, 2^17 samples) the
    unrolled graph makes XLA compile times explode. This wrapper traces
    encode+generate ONCE and runs them under ``lax.scan``; semantics are
    identical (residual carry is stop-gradient, reference
    ``iterativedecomposition.py:340-349``).

    Returns ``fn(params, spec_or_audio, key, do_transform=True) ->
    (channels, vecs, schedules, residual_spec)``.
    """

    def iterative(params, audio_or_spec, key, do_transform: bool = True,
                  return_feats: bool = False):
        spec = (
            model.transform(audio_or_spec) if do_transform else audio_or_spec
        )
        bound = None
        if model.residual_clamp_scale:
            bound = model.residual_clamp_scale * jnp.max(
                jnp.abs(spec), axis=(-2, -1), keepdims=True
            )

        collect_feats = bool(return_feats and model.spectral_filter)

        def step(carry, i):
            spec = carry
            v, sched = model.apply(params, spec, method=SIAMModel.encode)
            ch = model.apply(
                params,
                v,
                sched,
                jax.random.fold_in(key, i),
                spec,
                method=SIAMModel.generate,
            )
            current = model.transform(ch)
            new_spec = lax.stop_gradient(spec - current)
            if bound is not None:
                new_spec = jnp.clip(new_spec, -bound, bound)
            outs = (ch[:, 0], v[:, 0], sched[:, 0])
            if collect_feats:
                # the wire-side conditioning feature of spectral_filter
                # (what a codec transmits per event)
                outs = outs + (SIAMModel.spectral_feat_static(
                    spec, sched, model.in_channels
                ),)
            return new_spec, outs

        residual, outs = lax.scan(
            step, spec, jnp.arange(model.n_events)
        )
        chs, vs, scheds = outs[:3]
        channels = jnp.swapaxes(chs, 0, 1)
        vecs = jnp.swapaxes(vs, 0, 1)
        schedules = jnp.swapaxes(scheds, 0, 1)
        if collect_feats:
            feats = jnp.swapaxes(outs[3], 0, 1)  # (b, E, 64)
            return channels, vecs, schedules, residual, feats
        return channels, vecs, schedules, residual

    return iterative


def refit_event_gains(
    target: jax.Array,
    channels: jax.Array,
    ridge: float = 1e-3,
    span: int | None = None,
) -> jax.Array:
    """Orthogonal-MP amplitude re-projection over decoded event channels.

    Greedy matching pursuit fixes each event's amplitude at selection
    time against a *stale* residual; once all events are decoded, the
    jointly optimal amplitudes are the least-squares solution of the
    tiny ``n_events x n_events`` normal equations — the same amplitude
    re-fit the reference's dictionary update performs per atom
    (``/root/reference/modules/matchingpursuit.py:269-328``, where
    flattened atoms are re-projected against the residual). Solving it
    once per segment costs one ``(E, N) @ (N, E)`` matmul (MXU-friendly)
    and an ``E x E`` solve, and can only improve waveform error: the
    all-ones gain vector is in the feasible set.

    Args:
      target: ``(batch, 1, n_samples)`` original audio.
      channels: ``(batch, n_events, n_samples)`` decoded per-event audio.
      ridge: Tikhonov weight, scaled by the mean channel energy so it is
        amplitude-invariant; keeps dead (all-zero) channels at gain ~0
        and the solve well-conditioned under autodiff.
      span: optionally restrict the fit to the first ``span`` samples
        (e.g. the streaming-covered first half during overfit training).

    Returns:
      ``(batch, n_events)`` gains; ``einsum('be,ben->bn', gains,
      channels)`` is the refit reconstruction.
    """
    return refit_gains(target, channels, ridge=ridge, span=span)


def refine_event_alignment(
    target: jax.Array,
    channels: jax.Array,
    max_shift: int = 256,
    n_iters: int = 2,
    ridge: float = 1e-3,
    span: int | None = None,
):
    """Coordinate-descent shift+gain refinement of decoded events.

    The encoder places events at FRAME resolution (attention over
    ``n_frames``, one frame = ``transform_step_size`` samples — reference
    ``iterativedecomposition.py:340-390``), so a decoded event can sit up
    to half a frame off the content it explains; at 22 kHz that phase
    error alone caps waveform SNR near 0 dB even when the event SOUNDS
    right. This pass fixes it the matching-pursuit way: for each event in
    turn, cross-correlate it (one FFT, XLA-fused) against the residual of
    everything else, take the best circular shift within ``±max_shift``
    samples and its closed-form gain, and update. A final joint
    :func:`refit_event_gains` re-balances amplitudes. Encode-time only —
    the original audio is in hand, and the event tuple already carries a
    time position the shift folds into.

    Returns ``(refined_channels, shifts, gains)`` with ``shifts``
    ``(batch, n_events)`` in samples (positive = delayed) and ``gains``
    the final joint re-fit gains; sum ``einsum('be,ben->bn', gains,
    refined_channels)`` for the reconstruction.
    """
    if span is not None:
        # run the analysis on the spanned slice (e.g. the streaming-
        # covered first half during overfit training, matching
        # refit_event_gains(span=...)), then apply the resulting
        # corrections to the FULL-length channels. The slice wraps
        # circularly at `span` instead of `n` during analysis — a
        # max_shift-sample edge effect, negligible for max_shift << span.
        _, shifts, gains = refine_event_alignment(
            target[..., :span],
            channels[..., :span],
            max_shift=max_shift,
            n_iters=n_iters,
            ridge=ridge,
        )
        n_full = channels.shape[-1]
        idx = (
            jnp.arange(n_full)[None, None, :] - shifts[..., None]
        ) % n_full
        refined = jnp.take_along_axis(channels, idx, axis=-1)
        return refined, shifts, gains

    n = channels.shape[-1]
    n_events = channels.shape[1]
    tgt = target[:, 0]

    # seed from the JOINT gain re-fit: the per-event coordinate descent
    # is monotone from wherever it starts, so starting at the refit
    # state guarantees the aligned result is never worse than
    # :func:`refit_event_gains` alone (starting from raw channels only
    # guarantees never-worse-than-raw, and a greedy early shift can then
    # land below the plain refit — observed on the tiny overfit smoke).
    # Channels stay UNIT-scale (shift-only) throughout; gains live in a
    # separate cumulative vector so the returned corrections are
    # ABSOLUTE — decode re-renders raw channels and must be able to
    # apply (shift, gain) directly (inference.py SIAMEncoding).
    cum = refit_event_gains(target, channels, ridge=ridge)

    # allowed circular lags: [0..max_shift] and [n-max_shift..n-1]
    lag_mask = jnp.zeros((n,), bool).at[: max_shift + 1].set(True)
    lag_mask = lag_mask.at[n - max_shift :].set(True)

    def one_event(carry, e):
        chs, cum = carry
        ch = jnp.take(chs, e, axis=1)  # unit-scale, shifted-so-far
        ce = jnp.take(cum, e, axis=1)
        total = jnp.einsum("be,ben->bn", cum, chs)
        resid = tgt - (total - ce[:, None] * ch)
        # xc[k] = <resid, roll(ch, k)> for every circular lag k
        # repo fft helpers, not jnp.fft — the axon backend's ortho-norm
        # and eager-complex gaps are papered over there (CLAUDE.md)
        xc = irfft(
            rfft(resid, axis=-1) * jnp.conj(rfft(ch, axis=-1)),
            n=n,
            axis=-1,
        )
        # maximize |projection|: energy removed is xc^2 / ||ch||^2
        score = jnp.where(lag_mask[None], xc**2, -jnp.inf)
        k = jnp.argmax(score, axis=-1)
        best = jnp.take_along_axis(xc, k[:, None], axis=-1)[:, 0]
        energy = jnp.sum(ch**2, axis=-1)
        gain = best / jnp.maximum(energy, 1e-12)
        # roll each batch row by its own lag (delayed by k, circular)
        idx = (jnp.arange(n)[None, :] - k[:, None]) % n
        shifted = jnp.take_along_axis(ch, idx, axis=-1)
        chs = chs.at[:, e].set(shifted)
        cum = cum.at[:, e].set(gain)
        # signed shift in [-max_shift, max_shift]
        signed = jnp.where(k > n // 2, k - n, k)
        return (chs, cum), signed

    def sweep(carry, _):
        carry, shifts = lax.scan(one_event, carry, jnp.arange(n_events))
        return carry, shifts

    (refined, cum), shift_hist = lax.scan(
        sweep, (channels, cum), jnp.arange(n_iters)
    )
    # each sweep returns incremental lags; the wire-format correction is
    # their (circular) cumulative sum
    shifts = jnp.swapaxes(jnp.sum(shift_hist, axis=0), 0, 1)  # (batch, E)
    # final joint re-fit over the aligned channels; `cum` is in its
    # feasible set, so this can only improve further
    gains = refit_event_gains(target, refined, ridge=ridge)
    return refined, shifts, gains


def make_random_sequence_fn(model: SIAMModel):
    """Render events from reservoir-sampled vectors at random sparse times
    (reference ``random_sequence``, ``iterativedecomposition.py:241-273``).
    Returns a jittable fn(params, vecs, key) -> (audio, vecs, times)."""

    n_events = model.n_events
    n_frames = model.n_frames

    def random_sequence(params, vecs, key):
        batch_size = vecs.shape[0]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        raw_times = jax.random.normal(
            k1, (batch_size, n_events, n_frames)
        )
        raw_times = raw_times.at[:, :, n_frames // 2 :].set(0.0)
        times = sparse_softmax(raw_times, normalize=True, axis=-1)
        times = (
            times
            * jax.random.uniform(k2, times.shape)
            * jax.random.bernoulli(k3, 0.5, times.shape)
        )
        outs = []
        for i in range(n_events):
            outs.append(
                model.apply(
                    params,
                    vecs[:, i : i + 1, :],
                    times[:, i : i + 1, :],
                    jax.random.fold_in(k4, i),
                    method=SIAMModel.generate,
                )
            )
        return jnp.concatenate(outs, axis=1), vecs, times

    return random_sequence


class Reservoir:
    """Host-side reservoir of recent event vectors for self-supervised
    previews (reference ``iterativedecomposition.py:174-175,357-360``)."""

    def __init__(self, size: int, context_dim: int, seed: int = 0):
        self.size = size
        self.buffer = np.zeros((size, context_dim), dtype=np.float32)
        self.rng = np.random.default_rng(seed)

    def update(self, vecs: np.ndarray):
        v = np.asarray(vecs).reshape(-1, self.buffer.shape[1])
        indices = self.rng.permutation(self.size)[: v.shape[0]]
        self.buffer[indices] = v[: len(indices)]

    def sample(self, batch_size: int, n_events: int) -> np.ndarray:
        total = batch_size * n_events
        indices = self.rng.permutation(self.size)[:total]
        return self.buffer[indices].reshape(
            batch_size, n_events, self.buffer.shape[1]
        )


def fade_tail(n_samples: int, power: int = 8) -> jax.Array:
    """The codec's analysis-window envelope, shape ``(1, 1, n_samples)``:
    ones over the first half, a ``linspace(1→0)**power`` ramp over the
    second. The encoder's streaming mask confines events to a window's
    first half, so every trainer encodes the fade-tailed window
    (``scripts/siam_overfit.py``) — and an encoder fed an UNfaded tail
    is out-of-distribution (measured ~6 dB on the wire codec,
    BENCHMARKS.md). One definition so trainer, walk, and rate tooling
    cannot drift apart."""
    half = n_samples // 2
    return jnp.ones((1, 1, n_samples)).at[..., half:].set(
        jnp.linspace(1.0, 0.0, n_samples - half) ** power
    )


def make_streaming_fn(model: SIAMModel):
    """Build a reusable streaming encoder with the per-window program
    jitted ONCE (periodic evals would otherwise re-trace every call).

    Returns ``stream(params, audio, key, return_event_vectors=False)``
    implementing the half-overlap streaming window walk over
    arbitrary-length audio (reference ``streaming``,
    ``iterativedecomposition.py:275-319``).
    """
    window_size = model.n_samples
    frame_window = model.n_frames
    frame_step = frame_window // 2
    _scan_fn = make_iterative_fn(model)

    # device-resident window walk (VERDICT r1 item 8): the residual
    # spectrogram and the event segments stay on device across windows —
    # offsets are traced, so every window runs the same compiled program
    # and nothing round-trips through host numpy until the final output.
    @jax.jit
    def window_step(params, spec, segments, frame_i, sample_i, key):
        window = lax.dynamic_slice(
            spec, (0, 0, frame_i), (spec.shape[0], spec.shape[1], frame_window)
        )
        channels, vecs, schedules, residual = _scan_fn(
            params, window, key, do_transform=False
        )
        spec = lax.dynamic_update_slice(spec, residual, (0, 0, frame_i))
        seg = lax.dynamic_slice(
            segments, (0, 0, sample_i), (1, model.n_events, window_size)
        )
        segments = lax.dynamic_update_slice(
            segments, seg + channels, (0, 0, sample_i)
        )
        return spec, segments, channels, vecs, schedules

    # pristine-windows mode: encode each window EXACTLY the way the
    # overfit/quality trainers present it — a standalone time-domain
    # slice with the fade-tailed second half (the streaming mask
    # confines events to the first half, so trainers fade the tail;
    # an unfaded tail measured ~6 dB of OOD loss in the wire codec) —
    # and a fresh transform of that slice (the big-spec slice differs
    # at window boundaries from the standalone transform the trainers
    # use). No residual handoff: the write-back is skipped entirely.
    _fade_tail = fade_tail(window_size)

    # time-domain residual handoff (the DEFAULT walk, round 4): window k
    # encodes transform((audio_slice - decoded_so_far_slice) * fade) —
    # later windows see earlier removals (the reference's iterative-
    # decomposition semantics, iterativedecomposition.py:275-319) with
    # the subtraction done where it is EXACT. The reference subtracts
    # magnitude spectrograms, which is not a linear operation on the
    # signal (|STFT(a-b)| != |STFT a| - |STFT b|) and can hand the next
    # window infeasible negative "magnitudes"; subtracting the decoded
    # AUDIO before the transform removes exactly the content the
    # previous windows explained. Only the immediately-previous window's
    # decode reaches window k's first half (events are mask-confined to
    # window first halves; rendered channels span one window), so the
    # handoff tail is precisely what scripts/siam_overfit.py
    # --residual-handoff trains the encoder on. The window is presented
    # standalone-fade-tailed, matching training (fade_tail above).
    @jax.jit
    def handoff_window_step(params, audio, decoded, segments, sample_i, key):
        a = lax.dynamic_slice(audio, (0, 0, sample_i), (1, 1, window_size))
        d = lax.dynamic_slice(decoded, (0, 0, sample_i), (1, 1, window_size))
        win = (a - d) * _fade_tail
        channels, vecs, schedules, _ = _scan_fn(
            params, model.transform(win), key, do_transform=False
        )
        seg = lax.dynamic_slice(
            segments, (0, 0, sample_i), (1, model.n_events, window_size)
        )
        segments = lax.dynamic_update_slice(
            segments, seg + channels, (0, 0, sample_i)
        )
        dsum = jnp.sum(channels, axis=1, keepdims=True)
        decoded = lax.dynamic_update_slice(decoded, d + dsum, (0, 0, sample_i))
        return decoded, segments, channels, vecs, schedules

    @jax.jit
    def pristine_window_step(params, audio, segments, sample_i, key):
        win = lax.dynamic_slice(
            audio, (0, 0, sample_i), (1, 1, window_size)
        ) * _fade_tail
        channels, vecs, schedules, _ = _scan_fn(
            params, model.transform(win), key, do_transform=False
        )
        seg = lax.dynamic_slice(
            segments, (0, 0, sample_i), (1, model.n_events, window_size)
        )
        segments = lax.dynamic_update_slice(
            segments, seg + channels, (0, 0, sample_i)
        )
        return segments, channels, vecs, schedules

    def stream(
        params,
        audio: jax.Array,
        key: jax.Array,
        return_event_vectors: bool = False,
        fixed_noise: bool = False,
        refit_gains_against: jax.Array | None = None,
        refit_ridge: float = 1e-3,
        align_refine: int = 0,
        pristine_windows: bool = False,
        mode: str = "handoff",
    ):
        """``fixed_noise=True`` passes the SAME key to every window
        (instead of the reference's per-window fold): required when
        scoring a checkpoint trained with a pinned decoder-noise key
        (scripts/siam_overfit.py --fixed-noise) — the decoder memorizes
        the exact draw, so folded keys render mismatched audio. Python-
        level only; the compiled per-window program is unchanged.

        ``refit_gains_against``: optionally re-project every decoded
        (window, event) channel's amplitude against this ``(1, 1,
        n_samples)`` target via :func:`refit_event_gains` before the
        final sum — the streaming-walk form of the OMP amplitude re-fit
        (greedy amplitudes are fixed against stale residuals; the joint
        least-squares fix-up can only lower waveform error). The encoder
        has the original audio at encode time, so this is a legitimate
        codec-side step, not an eval-time cheat.

        ``mode`` selects how each window's encoder input is built:

        - ``"handoff"`` (default): time-domain residual handoff — window
          k encodes ``(audio_slice - decoded_so_far) * fade_tail`` with
          its own transform. The reference's later-windows-see-earlier-
          removals semantics (``iterativedecomposition.py:275-319``)
          with the subtraction done in the domain where it is exact;
          what ``scripts/siam_overfit.py --residual-handoff`` trains.
        - ``"spec"``: the literal reference convention — one transform
          of the whole audio, per-window magnitude-spectrogram residual
          written back in place.
        - ``"pristine"`` (or ``pristine_windows=True``): no handoff at
          all; every window encoded as a standalone fade-tailed slice
          (how --stream-windows checkpoints WITHOUT --residual-handoff
          were trained; measured ~3.6 dB above the spec walk on such a
          checkpoint, BENCHMARKS.md)."""
        if pristine_windows:
            mode = "pristine"
        if mode not in ("handoff", "spec", "pristine"):
            raise ValueError(f"unknown streaming mode {mode!r}")
        samps = audio.shape[-1]
        spec = model.transform(audio)
        time = spec.shape[-1]

        segments = jnp.zeros((1, model.n_events, samps + window_size))
        decoded = jnp.zeros((1, 1, samps + window_size))
        all_vecs, all_times, all_events, offsets = [], [], [], []

        step_count = 0
        for i in range(0, time - frame_window, frame_step):
            step_key = (
                key if fixed_noise else jax.random.fold_in(key, step_count)
            )
            if mode == "pristine":
                segments, channels, vecs, schedules = pristine_window_step(
                    params, audio, segments,
                    i * model.transform_step_size, step_key,
                )
            elif mode == "handoff":
                decoded, segments, channels, vecs, schedules = (
                    handoff_window_step(
                        params, audio, decoded, segments,
                        i * model.transform_step_size, step_key,
                    )
                )
            else:
                spec, segments, channels, vecs, schedules = window_step(
                    params, spec, segments,
                    i, i * model.transform_step_size, step_key,
                )
            step_count += 1
            all_vecs.append(vecs)
            all_times.append(schedules)
            all_events.append(channels)
            offsets.append(i * model.transform_step_size)

        final = jnp.sum(segments, axis=1, keepdims=True)[..., :samps]
        if refit_gains_against is not None:
            # scatter each window's per-event channels to their absolute
            # positions so every (window, event) pair gets its own gain
            bufs = []
            for off, ch in zip(offsets, all_events):
                buf = jnp.zeros((1, model.n_events, samps + window_size))
                bufs.append(lax.dynamic_update_slice(buf, ch, (0, 0, off)))
            tracks = jnp.concatenate(bufs, axis=1)[..., :samps]
            if align_refine:
                # shift+gain coordinate descent over every (window,
                # event) track — aligned >= refit >= raw holds here too
                tracks, _, gains = refine_event_alignment(
                    refit_gains_against, tracks,
                    max_shift=align_refine, ridge=refit_ridge,
                )
            else:
                gains = refit_event_gains(
                    refit_gains_against, tracks, ridge=refit_ridge
                )
            final = jnp.einsum("be,ben->bn", gains, tracks)[:, None]
        if not return_event_vectors:
            return final
        return (
            final,
            jnp.concatenate(all_vecs, axis=1),
            jnp.concatenate(all_times, axis=1),
            jnp.concatenate(all_events, axis=1),
        )

    return stream


def streaming_encode(
    model: SIAMModel,
    params,
    audio: jax.Array,
    key: jax.Array,
    return_event_vectors: bool = False,
    fixed_noise: bool = False,
    refit_gains_against: jax.Array | None = None,
    refit_ridge: float = 1e-3,
    align_refine: int = 0,
    pristine_windows: bool = False,
    mode: str = "handoff",
):
    """One-shot convenience wrapper over :func:`make_streaming_fn` (use
    the factory directly when calling repeatedly — it caches the jitted
    per-window program)."""
    return make_streaming_fn(model)(
        params, audio, key, return_event_vectors=return_event_vectors,
        fixed_noise=fixed_noise, refit_gains_against=refit_gains_against,
        refit_ridge=refit_ridge, align_refine=align_refine,
        pristine_windows=pristine_windows, mode=mode,
    )
