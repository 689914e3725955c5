"""SIAM flagship training-quality + honest-throughput run (VERDICT r1
items 4 & 5; reference ``iterativedecomposition.py:377-606``,
``v3blogpost.py:59-93``).

Trains the full reference configuration (n_samples 2^17, 32 events,
batch 2, STFT 2048/256, Adam 1e-4) at ``attn_floor=0.0`` (exact
reference semantics) and reports:

- honest steady-state step time: >=100 steps of wall clock with a
  loss-value-dependent host transfer EVERY step (the axon backend defers
  work past block_until_ready), plus the pipelined variant (transfer
  once at the end) for comparison;
- reconstruction quality on a HELD-OUT segment (never streamed during
  training): recon SNR and log-spectral distance, periodically;
- a checkpoint + a JSON metrics file consumed by scripts/report.py.

Run to completion in the background (never under `timeout` — killing a
TPU process wedges the device); the in-process watchdog is
faulthandler-based.
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env, enable_compilation_cache
apply_platform_from_env()
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mptpu.data import AudioIterator
from mptpu.losses import iterative_loss
from mptpu.models.siam import (
    SIAMModel,
    make_iterative_fn,
    siam_transform,
)
from mptpu.train import optimizer, trust_ratio_clip, CheckpointManager
from mptpu.utils.jsonio import dump_json


def spectral_metrics(target: jax.Array, recon: jax.Array, window: int, step: int):
    """Recon SNR (dB, time domain) + log-spectral distance (dB RMS)."""
    snr = 10.0 * jnp.log10(
        jnp.maximum(jnp.sum(target**2), 1e-12)
        / jnp.maximum(jnp.sum((target - recon) ** 2), 1e-12)
    )
    ts = siam_transform(target, window, step)
    rs = siam_transform(recon, window, step)
    lsd = jnp.sqrt(
        jnp.mean((20 * jnp.log10(ts + 1e-8) - 20 * jnp.log10(rs + 1e-8)) ** 2)
    )
    return snr, lsd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--eval-every", type=int, default=250)
    parser.add_argument("--stream-eval-every", type=int, default=1000,
                        help="run the streaming-walk holdout eval (full-"
                             "segment coverage via the half-overlap window "
                             "walk) every N steps; 0 disables")
    parser.add_argument("--timing-steps", type=int, default=100)
    parser.add_argument("--attn-floor", type=float, default=0.0)
    parser.add_argument("--switch-clamp", type=float, default=100.0,
                        help="straight-through cap on the event-switch "
                             "amplitude (0 = exact reference; see the "
                             "round-3 NaN post-mortem in BENCHMARKS.md)")
    parser.add_argument("--residual-clamp", type=float, default=4.0,
                        help="clip the stop-gradient residual carry to "
                             "+/- this multiple of max|initial spec| "
                             "(0 = exact reference)")
    parser.add_argument("--encoder-clamp", type=float, default=1e4,
                        help="per-block activation clip in the gated "
                             "encoder stack (0 = exact reference)")
    parser.add_argument("--attn-leak", type=float, default=0.0,
                        help="straight-through leaky backward slope for the "
                             "attention relu (forward stays exact reference "
                             "relu); escapes the silence local optimum")
    parser.add_argument("--waveform-weight", type=float, default=0.0,
                        help="add W * relative waveform error on the first "
                             "half (the encoder-covered span) to the "
                             "spectral loss — the round-3 overfit campaign "
                             "showed the spectral loss alone never produces "
                             "positive waveform SNR (phase is unconstrained)")
    parser.add_argument("--selection-leak", type=float, default=0.0,
                        help="leaky-relu slope for decoder relu selections "
                             "(0 = exact reference)")
    parser.add_argument("--selection-floor", type=float, default=0.0,
                        help="additive floor on relu selection weights — the "
                             "round-3 fix for the greedy dead-event trap "
                             "(29/32 events permanently silent); 0 = exact "
                             "reference")
    parser.add_argument("--switch-bias-init", type=float, default=0.0,
                        help="initial bias of the event-switch head (positive "
                             "values start events audible instead of at the "
                             "silence saddle; 0 = exact reference)")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--fixed-noise", action="store_true",
                        help="pin ONE noise key for every forward (train "
                             "and eval) so the decoder's noise draws are "
                             "a fixed dictionary instead of a per-step "
                             "redraw. The reference redraws torch RNG "
                             "per forward, so its decode is stochastic "
                             "and the waveform term cannot converge EVEN "
                             "ON TRAINING DATA (proven by the r3 overfit "
                             "campaign: positive waveform SNR required "
                             "--fixed-noise). The r3 generalization run "
                             "trained stochastic and its holdout "
                             "waveform SNR pinned at ~0 — this flag "
                             "tests the train-side-stochasticity "
                             "hypothesis against the training-amount "
                             "one (VERDICT r3 missing #1)")
    parser.add_argument("--gain-refit", type=float, default=0.0,
                        help="train the waveform term THROUGH a per-event "
                             "OMP gain re-fit on the covered first half "
                             "(ridge value; 0 = off = r3 behavior). The "
                             "overfit campaign's decisive lever: raw-"
                             "trained amplitudes made waveform SNR a "
                             "scale problem (2.7 dB in 9k steps); "
                             "training through the refit made it "
                             "direction-only (9.4 dB in 1.8k). The r3/r4 "
                             "generalization runs trained raw — this "
                             "tests the same lever on holdout waveform "
                             "SNR (ROADMAP r4)")
    parser.add_argument("--gain-reg", type=float, default=0.0,
                        help="with --gain-refit: penalize (gain - 1)^2 on "
                             "alive events so the trained amplitudes "
                             "converge to the refit solution and the raw "
                             "decode stops relying on it")
    parser.add_argument("--b2", type=float, default=0.999,
                        help="Adam beta2; 0.95 adapts the second moment "
                             "within ~20 steps — the optimizer-cliff "
                             "guard from the overfit campaign "
                             "(nan_hunt4: finite grads, gnorm 3e13)")
    parser.add_argument("--trust-ratio", type=float, default=0.0,
                        help="per-leaf update clip: ||update|| <= ratio "
                             "* ||param|| (0 = off)")
    parser.add_argument("--out", type=str, default="trained_weights/siam_quality")
    parser.add_argument("--watchdog-s", type=int, default=14000)
    parser.add_argument("--stall-s", type=int, default=900,
                        help="re-armed per-progress watchdog: if no step "
                             "completes for this long (device wedge), dump "
                             "tracebacks and exit instead of hanging")
    parser.add_argument("--medium", action="store_true",
                        help="2^15/16-event scale (the r3 overfit "
                             "campaign's capacity-matched config) — "
                             "cheap enough per step to run a reference-"
                             "analogous number of steps on one chip")
    parser.add_argument("--tiny", action="store_true",
                        help="small config for smoke testing the script flow")
    parser.add_argument("--resume", action="store_true",
                        help="resume params/opt_state/step from the newest "
                             "checkpoint in --out (skips the timing phases)")
    parser.add_argument("--dense", action="store_true",
                        help="train on the MusicNet-density synthetic corpus")
    parser.add_argument("--fresh-corpus", action="store_true",
                        help="stream FRESHLY synthesized dense segments "
                             "every batch (infinite corpus, never-repeating "
                             "seeds disjoint from the holdout) instead of "
                             "cycling the fixed 144 s --dense corpus. The "
                             "30k-step round-4 run showed the fixed corpus "
                             "is memorized by ~5k steps (BENCHMARKS.md); "
                             "this removes that ceiling. Implies --dense "
                             "eval corpora (holdout stays the disjoint-"
                             "content fixed set so trajectories compare).")
    parser.add_argument("--spectral-skip", action="store_true",
                        help="SIAMModel.spectral_skip: condition the "
                             "event generator directly on the residual "
                             "spectrum at the selected frame (round-5 "
                             "generalization A/B; see anatomy.json "
                             "evidence in the model docstring)")
    parser.add_argument("--spectral-filter", action="store_true",
                   help="SIAMModel.spectral_filter: analysis-driven "
                        "zero-phase source-filter stage (round-5 arm C; "
                        "see model docstring)")
    parser.add_argument("--no-fade", action="store_true",
                        help="disable the reference's second-half target fade")
    args = parser.parse_args()

    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)
    os.makedirs(args.out, exist_ok=True)

    if args.selection_leak or args.selection_floor:
        # global knobs read at trace time — set before any jit below
        from mptpu.sparse.quantize import (
            set_selection_floor,
            set_selection_leak,
        )

        set_selection_leak(args.selection_leak)
        set_selection_floor(args.selection_floor)

    if args.tiny:
        n_samples, n_events, hidden, context_dim = 2**13, 4, 32, 16
        window, step_sz = 512, 256
    elif args.medium:
        # the r3 overfit campaign's capacity-matched scale (15.15 dB
        # single-segment proof): ~8x cheaper per step than full, so a
        # reference-analogous training AMOUNT (tens of thousands of
        # steps — v3blogpost.py:59,93 is ~126k) fits a chip-evening.
        # Purpose: test the round-3 "training-amount" hypothesis for the
        # ~0 dB holdout waveform SNR at a scale where the step budget
        # exists (VERDICT r3 next-round item 2)
        n_samples, n_events, hidden, context_dim = 2**15, 16, 64, 32
        window, step_sz = 2048, 256
    else:
        # full reference hyperparams (iterativedecomposition.py:25-42)
        n_samples, n_events, hidden, context_dim = 2**17, 32, 128, 32
        window, step_sz = 2048, 256
    model = SIAMModel(
        n_samples=n_samples,
        context_dim=context_dim,
        in_channels=window // 2 + 1,
        hidden_channels=hidden,
        n_events=n_events,
        transform_window_size=window,
        transform_step_size=step_sz,
        fft_resonance=True,
        attn_floor=args.attn_floor,
        attn_leak=args.attn_leak,
        switch_clamp=args.switch_clamp,
        residual_clamp_scale=args.residual_clamp,
        encoder_clamp=args.encoder_clamp,
        switch_bias_init=args.switch_bias_init,
        spectral_skip=args.spectral_skip,
        spectral_filter=args.spectral_filter,
    )

    audio_path = None
    holdout_path = None
    if args.fresh_corpus:
        args.dense = True
    if args.dense:
        from mptpu.data.synthetic import ensure_demo_dataset

        audio_path = ensure_demo_dataset(
            "trained_weights/dense_corpus", n_files=6, seconds=24.0, dense=True
        )
        # held-out CONTENT, not just a held-out crop: generated with seeds
        # disjoint from every training WAV, so the metric measures
        # generalization rather than memorization of overlapping crops
        holdout_path = ensure_demo_dataset(
            "trained_weights/dense_corpus_holdout",
            n_files=2,
            seconds=24.0,
            dense=True,
            seed_offset=1000,
        )

    train_stream = AudioIterator(
        batch_size=args.batch_size,
        n_samples=n_samples,
        samplerate=22050,
        normalize=True,
        seed=1,
        audio_path=audio_path,
    )
    holdout = next(iter(AudioIterator(
        1, n_samples, normalize=True, seed=987654,
        audio_path=holdout_path or audio_path,
    )))
    # a LONG disjoint holdout for the streaming-walk eval: single-window
    # events are confined to the first half by the encoder's mask; full
    # coverage is delivered by the half-overlap streaming walk, so this is
    # the eval matching how the codec is actually used
    # (iterativedecomposition.py:275-319)
    stream_holdout = next(iter(AudioIterator(
        1, 3 * n_samples, normalize=True, seed=13579,
        audio_path=holdout_path or audio_path,
    )))

    key = jax.random.PRNGKey(0)
    # --fixed-noise: one pinned key for every forward; the decoder's
    # noise draws become a fixed dictionary (see the flag help)
    noise_key = jax.random.PRNGKey(42)

    def step_key(i):
        return noise_key if args.fixed_noise else jax.random.fold_in(key, i)
    example = jnp.zeros((args.batch_size, 1, n_samples))
    t0 = time.perf_counter()
    params = jax.jit(model.init)(key, example, key)
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0
    print(f"init {init_s:.1f}s", flush=True)

    opt = optimizer(lr=args.lr, b1=0.9, b2=args.b2)
    trust_clip = trust_ratio_clip(args.trust_ratio) if args.trust_ratio else None
    trust_state = optax.EmptyState()
    opt_state = opt.init(params)
    ckpt = CheckpointManager(args.out, every=250)
    resume_step = 0
    if args.resume:
        payload = ckpt.latest()
        if payload is not None:
            params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
            if payload["opt_state"] is not None:
                opt_state = jax.tree_util.tree_map(
                    jnp.asarray, payload["opt_state"]
                )
            resume_step = payload["step"]
            print(f"resumed from step {resume_step}", flush=True)
    iterative = make_iterative_fn(model)

    # the reference fades the second half of the target before the loss
    # (iterativedecomposition.py:519-524): the encoder's attention mask
    # hides the second half, so un-fadeable content there would otherwise
    # penalize every event and push amplitudes toward silence
    fade = jnp.ones((1, 1, n_samples))
    if not args.no_fade:
        fade = fade.at[..., n_samples // 2 :].set(
            jnp.linspace(1.0, 0.0, n_samples // 2) ** 8
        )

    half = n_samples // 2
    wave_w = float(args.waveform_weight)

    def loss_fn(params, target, key):
        channels, vecs, schedules, _ = iterative(params, target, key)
        # NOTE mag_epsilon smooths |z| but its gradient at exactly-silent
        # channels is still zero (sqrt(x^2+eps^2)' = 0 at 0) — escaping
        # the silence optimum needs attn_floor (+ attn_leak), see
        # tests/test_models.py::test_silence_collapse_escape_needs_floor_and_leak
        loss = iterative_loss(
            target * fade,
            channels,
            lambda x: siam_transform(x, window, step_sz, mag_epsilon=1e-6),
        )
        if wave_w:
            # relative waveform error on the first half — the span the
            # encoder's streaming mask actually covers. The spectral loss
            # alone leaves phase unconstrained, so waveform SNR never goes
            # positive without this term (round-3 overfit campaign,
            # BENCHMARKS.md)
            recon = jnp.sum(channels, axis=1, keepdims=True)
            if args.gain_refit:
                # train THROUGH the per-event gain re-fit (see --gain-refit
                # help; mirrors scripts/siam_overfit.py refit_recon incl.
                # the ±10 scale-degeneracy clip)
                from mptpu.models.siam import refit_event_gains

                gains = refit_event_gains(
                    target, channels, ridge=args.gain_refit, span=half
                )
                gains = jnp.clip(gains, -10.0, 10.0)
                recon = jnp.einsum("be,ben->bn", gains, channels)[:, None]
                if args.gain_reg:
                    alive = (
                        jnp.sum(channels[..., :half] ** 2, axis=-1) > 1e-12
                    )
                    loss = loss + args.gain_reg * jnp.sum(
                        jnp.where(alive, (gains - 1.0) ** 2, 0.0)
                    ) / jnp.maximum(jnp.sum(alive), 1)
            wave = jnp.sum(
                (recon[..., :half] - target[..., :half]) ** 2
            ) / jnp.maximum(jnp.sum(target[..., :half] ** 2), 1e-12)
            loss = loss + wave_w * wave
        return loss, channels

    @jax.jit
    def train_step(params, opt_state, target, key):
        (loss, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, target, key
        )
        gnorm = optax.global_norm(grads)
        # clip explosions (the STE leak can transiently spike gradients)
        scale = jnp.minimum(1.0, 5e4 / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = opt.update(grads, opt_state, params)
        if args.trust_ratio:
            # per-leaf optimizer-cliff bound — see
            # mptpu.train.trust_ratio_clip for the full anatomy
            updates, _ = trust_clip.update(updates, trust_state, params)
        new_params = optax.apply_updates(params, updates)
        # the reference guards only the loss (iterativedecomposition.py:
        # 535-540); a step with finite loss but NaN GRADS silently
        # poisons the params — guard both
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        params_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
        )
        return params_out, opt_out, loss

    @jax.jit
    def reconstruct(params, audio, key):
        channels, _, schedules, _ = iterative(params, audio, key)
        return jnp.sum(channels, axis=1, keepdims=True), jnp.max(schedules)

    from mptpu.models.siam import make_streaming_fn
    from mptpu.perceptual import pif_distance

    stream_fn = make_streaming_fn(model)
    pif_dist_fn = jax.jit(pif_distance)

    if args.fresh_corpus:
        # infinite never-repeating corpus (see the flag help); the fixed
        # train_stream above still exists but is not consumed. jnp.asarray
        # here (not in the synth thread) keeps device transfer on the
        # consumer thread — the axon relay is not thread-safe for puts.
        from mptpu.data.synthetic import fresh_segment_stream

        stream = (
            jnp.asarray(b)
            for b in fresh_segment_stream(
                args.batch_size,
                n_samples,
                # a resumed run continues into UNSEEN seeds instead of
                # replaying the corpus from the base
                seed_base=1_000_000 + resume_step * args.batch_size,
            )
        )
    else:
        stream = iter(train_stream)

    # ---- compile + 2 warmup steps (skipped on resume: warmup would
    # silently mutate the restored params before any recorded step)
    compile_s = 0.0
    if not args.resume:
        t0 = time.perf_counter()
        item = next(stream)
        params, opt_state, loss = train_step(params, opt_state, item, step_key(0))
        first_loss = float(loss)
        compile_s = time.perf_counter() - t0
        print(f"first step (incl compile) {compile_s:.1f}s loss {first_loss:.1f}",
              flush=True)
        params, opt_state, loss = train_step(
            params, opt_state, next(stream), step_key(1)
        )
        float(loss)

    metrics = {
        "config": (
            f"n_samples 2^{int(np.log2(n_samples))}, {n_events} events, "
            f"batch {args.batch_size}, STFT {window}/{step_sz}, "
            f"attn_floor {args.attn_floor:.3f}, "
            f"attn_leak {args.attn_leak:.3f}, "
            f"switch_clamp {args.switch_clamp:g}, "
            f"residual_clamp {args.residual_clamp:g}, "
            f"waveform_weight {args.waveform_weight:g}, "
            f"selection_leak {args.selection_leak:g}, "
            f"selection_floor {args.selection_floor:g}, "
            f"switch_bias_init {args.switch_bias_init:g}, "
            f"lr {args.lr:g}, "
            f"spectral_skip {args.spectral_skip}, "
            f"spectral_filter {args.spectral_filter}, "
            f"corpus {'fresh-infinite' if args.fresh_corpus else ('dense' if args.dense else 'sparse')}, "
            f"fade {'off' if args.no_fade else 'on'}, "
            f"fixed_noise {args.fixed_noise}, "
            f"b2 {args.b2:g}, trust_ratio {args.trust_ratio:g}, "
            f"gain_refit {args.gain_refit:g}, gain_reg {args.gain_reg:g}, "
            f"holdout {'disjoint-content' if holdout_path else 'same-corpus crop'}"
        ),
        "init_s": round(init_s, 1),
        "first_step_s": round(compile_s, 1),
        "eval": [],
    }
    prior_losses = []
    if args.resume:
        # preserve the original run's telemetry across resumes
        try:
            with open(os.path.join(args.out, "metrics.json")) as f:
                prior = json.load(f)
            metrics["eval"] = prior.get("eval", [])
            prior_losses = prior.get("losses", [])
            for k in ("first_step_s", "ms_per_step_synced",
                      "ms_per_step_pipelined"):
                if prior.get(k):
                    metrics[k] = prior[k]
        except (IOError, ValueError):
            pass

    timing_steps = 0 if args.resume else args.timing_steps

    # ---- honest step timing: per-step loss transfer over timing_steps
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(timing_steps):
        params, opt_state, loss = train_step(
            params, opt_state, next(stream), step_key(100 + i)
        )
        acc += float(loss)  # device->host every step
    if timing_steps:
        synced = (time.perf_counter() - t0) / timing_steps
        print(f"per-step-synced: {synced*1e3:.1f} ms/step "
              f"({1/synced:.2f} steps/s, mean loss {acc/timing_steps:.1f})",
              flush=True)
    else:
        synced = 0.0

    # ---- pipelined timing: transfer once at the end
    t0 = time.perf_counter()
    for i in range(timing_steps):
        params, opt_state, loss = train_step(
            params, opt_state, next(stream), step_key(300 + i)
        )
    if timing_steps:
        acc = float(loss)
        pipelined = (time.perf_counter() - t0) / timing_steps
        print(f"pipelined: {pipelined*1e3:.1f} ms/step "
              f"({1/pipelined:.2f} steps/s)", flush=True)
    else:
        pipelined = 0.0
    if timing_steps:
        metrics["ms_per_step_synced"] = round(synced * 1e3, 1)
        metrics["ms_per_step_pipelined"] = round(pipelined * 1e3, 1)

    # ---- training to quality, periodic held-out eval
    step0 = max(2 + 2 * timing_steps, resume_step + 1)
    losses = []
    collapse_guard = {"zero_streak": 0}
    run_start = time.perf_counter()
    last_i = step0
    for i in range(step0, args.iterations):
        last_i = i
        params, opt_state, loss = train_step(
            params, opt_state, next(stream), step_key(i)
        )
        if i % 25 == 0:
            # progress made — re-arm the stall watchdog (a wedged remote
            # device otherwise blocks in Array._value forever)
            faulthandler.cancel_dump_traceback_later()
            faulthandler.dump_traceback_later(args.stall_s, exit=True)
            l = float(loss)
            losses.append([i, round(l, 2)])
            print(f"iter {i} loss {l:.2f}", flush=True)
            # collapse telemetry (VERDICT r1: document attn_floor=0.0)
            if l == 0.0:
                collapse_guard["zero_streak"] += 1
            else:
                collapse_guard["zero_streak"] = 0
        if i % args.eval_every == 0:
            recon, sched_max = reconstruct(params, holdout,
                noise_key if args.fixed_noise else jax.random.PRNGKey(7))
            snr, lsd = spectral_metrics(holdout, recon, window, step_sz)
            # the encoder's streaming mask confines events to the first
            # half of the segment (full coverage comes from the
            # half-overlap streaming walk), so first-half metrics are the
            # honest single-segment codec quality
            half = n_samples // 2
            snr_h, lsd_h = spectral_metrics(
                holdout[..., :half], recon[..., :half], window, step_sz
            )
            rms = float(jnp.sqrt(jnp.mean(recon**2)))
            entry = {
                "step": i,
                "holdout_snr_db": round(float(snr), 3),
                "holdout_lsd_db": round(float(lsd), 3),
                "first_half_snr_db": round(float(snr_h), 3),
                "first_half_lsd_db": round(float(lsd_h), 3),
                "recon_rms": round(rms, 6),
                # phase-invariant perceptual distance (lower is better,
                # ~1.0 = silence; mptpu.perceptual.pif_distance) — the
                # reference's framing is PERCEPTUALLY lossless, so the
                # waveform/LSD pair alone under-reports progress
                "first_half_pif_dist": round(float(pif_dist_fn(
                    holdout[..., :half], recon[..., :half])), 4),
                # direct collapse telemetry: 0.0 == every event silent
                # (the loss alone can sit at a small negative value from
                # the mag_epsilon smoothing even when fully collapsed)
                "sched_max": round(float(sched_max), 6),
            }
            if args.stream_eval_every and i % args.stream_eval_every == 0:
                s_key = (noise_key if args.fixed_noise
                         else jax.random.PRNGKey(11))
                s_recon = stream_fn(params, stream_holdout, s_key,
                                  fixed_noise=args.fixed_noise)
                s_snr, s_lsd = spectral_metrics(
                    stream_holdout, s_recon, window, step_sz
                )
                entry["streaming_snr_db"] = round(float(s_snr), 3)
                entry["streaming_lsd_db"] = round(float(s_lsd), 3)
                # the OMP amplitude re-fit is part of the codec's encode
                # path (models/siam.py refit_event_gains) — score the
                # walk with it beside the plain greedy amplitudes
                r_recon = stream_fn(
                    params, stream_holdout, s_key, fixed_noise=args.fixed_noise,
                    refit_gains_against=stream_holdout,
                )
                r_snr, r_lsd = spectral_metrics(
                    stream_holdout, r_recon, window, step_sz
                )
                entry["streaming_refit_snr_db"] = round(float(r_snr), 3)
                entry["streaming_refit_lsd_db"] = round(float(r_lsd), 3)
                entry["streaming_refit_pif_dist"] = round(float(
                    pif_dist_fn(stream_holdout, r_recon)), 4)
                # pristine mode encodes each window as the trainer
                # presents it (standalone fade-tailed slice, own
                # transform) — on the sw3 overfit checkpoint this
                # recovered the training numbers through the walk
                # (5.78 -> 12.00 dB first-half; BENCHMARKS.md)
                p_recon = stream_fn(
                    params, stream_holdout, s_key, fixed_noise=args.fixed_noise,
                    refit_gains_against=stream_holdout,
                    pristine_windows=True,
                )
                p_snr, p_lsd = spectral_metrics(
                    stream_holdout, p_recon, window, step_sz
                )
                entry["streaming_pristine_snr_db"] = round(float(p_snr), 3)
                entry["streaming_pristine_lsd_db"] = round(float(p_lsd), 3)
            metrics["eval"].append(entry)
            print("eval", json.dumps(entry), flush=True)
            with open(os.path.join(args.out, "metrics.json"), "w") as f:
                dump_json({**metrics, "losses": prior_losses + losses}, f, indent=1)
        ckpt.maybe_save(i, params, opt_state)
        if time.perf_counter() - run_start > args.watchdog_s:
            print("time budget reached — exiting cleanly", flush=True)
            break
        if os.path.exists(os.path.join(args.out, "STOP")):
            print("STOP file found — exiting cleanly", flush=True)
            break

    # always checkpoint the final params (the loop's periodic save only
    # fires on multiples of `every`)
    from mptpu.train.checkpoint import save_checkpoint

    final_step = max(last_i, step0)
    save_checkpoint(
        os.path.join(args.out, f"ckpt_{final_step:09d}.pkl"),
        params,
        opt_state,
        final_step,
    )
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        dump_json({**metrics, "losses": prior_losses + losses}, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
