"""SIAM overfit existence proof: fit the flagship codec to ONE segment
until reconstruction SNR is unambiguously positive (VERDICT r2 item 1;
reference overfit mode ``iterativedecomposition.py:612-647``).

The reference's published artifact is reconstruction demos; its training
loss is magnitude-spectrogram-only (``iterative_loss`` over
``transform``), which rewards spectral match but cannot pin PHASE — so
waveform SNR can sit near 0 dB even when reconstructions sound right.
Two knobs (both off by default, both documented deviations used for the
demonstration run) make waveform SNR a meaningful target:

- ``--fixed-noise``: use ONE key for the decoder's noise draws every
  step (the reference redraws torch RNG per forward, so its decode is
  stochastic and cannot waveform-converge even in principle);
- ``--waveform-weight W``: add W * sum((recon-target)^2)/sum(target^2)
  to the loss — a phase-aware term that directly optimizes SNR. The
  magnitude loss still does the perceptual work; this pins phase.

Everything else is the full reference configuration: n_samples 2^17,
32 events, STFT 2048/256 (``iterativedecomposition.py:25-42``), the
attn_floor/attn_leak silence-collapse escape from the quality runs.

Run in the background to completion (never under `timeout`).
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

from mptpu.losses import iterative_loss
from mptpu.models.siam import (
    SIAMModel, fade_tail, make_iterative_fn, siam_transform,
)
from mptpu.train import optimizer, trust_ratio_clip, CheckpointManager
from mptpu.train.checkpoint import save_checkpoint
from mptpu.train.guard import StormGuard
from mptpu.utils.jsonio import dump_json
from mptpu.utils.wav import write_wav


def snr_db(target, recon):
    return 10.0 * jnp.log10(
        jnp.maximum(jnp.sum(target**2), 1e-12)
        / jnp.maximum(jnp.sum((target - recon) ** 2), 1e-12)
    )


_pif_dist_jit = None


def pif_dist(target, recon):
    """Phase-invariant perceptual distance (mptpu.perceptual.distance;
    lower is better, 1.0 ~ silence). Jitted once — eval-cadence cost."""
    global _pif_dist_jit
    if _pif_dist_jit is None:
        from mptpu.perceptual import pif_distance

        _pif_dist_jit = jax.jit(pif_distance)
    return float(_pif_dist_jit(target, recon))


def lsd_db(target, recon, window, step):
    ts = siam_transform(target, window, step)
    rs = siam_transform(recon, window, step)
    return jnp.sqrt(
        jnp.mean((20 * jnp.log10(ts + 1e-8) - 20 * jnp.log10(rs + 1e-8)) ** 2)
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=20000)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--attn-floor", type=float, default=0.01)
    p.add_argument("--attn-leak", type=float, default=0.1)
    p.add_argument("--waveform-weight", type=float, default=0.0)
    p.add_argument("--switch-clamp", type=float, default=20.0,
                   help="cap on selected event amplitude; the r3 run that "
                        "diverged rode its STE-clamped switches into the "
                        "old cap of 100 before the gradients went "
                        "non-finite, so keep this within ~10x of the "
                        "healthy sched_max (~2 in the quality runs)")
    p.add_argument("--grad-clip", type=float, default=1e3,
                   help="global-norm gradient clip (traced; changing it "
                        "never recompiles)")
    p.add_argument("--spike-thresh", type=float, default=1e5,
                   help="a sampled loss above this triggers rollback to "
                        "the last good snapshot and halves the lr "
                        "multiplier")
    p.add_argument("--residual-clamp", type=float, default=4.0)
    p.add_argument("--encoder-clamp", type=float, default=1e4,
                   help="per-block activation clip in the gated encoder "
                        "stack (0 = exact reference; prevents internal "
                        "f32 overflow of the degree-256 polynomial)")
    p.add_argument("--switch-bias-init", type=float, default=0.0,
                   help="initial event-switch bias; >0 starts the "
                        "attention relu alive instead of on its dead "
                        "boundary (init-only deviation for overfit runs)")
    p.add_argument("--selection-leak", type=float, default=0.0,
                   help="leaky-relu slope for the decoder's 'relu' item "
                        "selections (envelopes/noise filters/verbs). The "
                        "r3 overfit2 run died when every envelope-"
                        "selection logit went negative: the impulse "
                        "excitation becomes EXACTLY zero, every "
                        "downstream op multiplies that zero, and the "
                        "relu gate kills all gradients — the decoder is "
                        "permanently dead (loss frozen at 1997.42, gnorm "
                        "exactly 0, sched_max still ~1). A small slope "
                        "keeps the excitation and its gradients alive; "
                        "0 = exact reference semantics")
    p.add_argument("--selection-floor", type=float, default=0.0,
                   help="additive floor on 'relu' selection weights. The "
                        "leak fixes only the backward pass: overfit4 "
                        "converged to 3/32 alive events because a dead "
                        "event's zero render leaves the greedy residual "
                        "unchanged, so every later encode re-picks the "
                        "same frame/latent — a floor keeps every event "
                        "audible so the greedy loop differentiates "
                        "(envelope-selection analogue of attn_floor); "
                        "0 = exact reference semantics")
    p.add_argument("--gain-refit", type=float, default=0.0,
                   help="enable OMP-style joint amplitude re-projection "
                        "(models/siam.py refit_event_gains) with this "
                        "ridge weight (0 = off). Greedy encoding fixes "
                        "each event's amplitude against a stale "
                        "residual; the closed-form 32x32 least-squares "
                        "re-fit makes the waveform term a direction-"
                        "only problem — it can never be worse than "
                        "unit gains. Applied to the waveform loss and "
                        "reported beside the raw SNR at eval; the mag "
                        "loss still sees raw channels so event scales "
                        "stay anchored")
    p.add_argument("--align-refine", type=int, default=0,
                   help="at eval, also score the encode-time shift+gain "
                        "refinement (models/siam.py "
                        "refine_event_alignment) within this many "
                        "samples (0 = skip). The encoder places events "
                        "at frame resolution (256 samples); this "
                        "re-aligns each decoded event against the "
                        "residual of the others, the MP refinement "
                        "pass")
    p.add_argument("--ema", type=float, default=0.0,
                   help="Polyak-average the params at this decay and "
                        "score the average at every eval (0 = off). The "
                        "25-step loss samples of a FULL-BATCH fixed-"
                        "noise run swing by hundreds: greedy selection "
                        "flips make the loss landscape piecewise — "
                        "averaging over the flip dynamics is the "
                        "standard smoother")
    p.add_argument("--residual-handoff", type=int, default=0,
                   help="with --stream-windows N>1, switch window k's "
                        "training input to the RESIDUAL after window "
                        "k-1's decode once this many steps have run "
                        "(0 = off, pristine windows throughout). The "
                        "deployment decode is the half-overlap residual-"
                        "handoff walk (reference iterativedecomposition"
                        ".py:275-319): window k encodes what earlier "
                        "windows did not explain. Pristine-trained "
                        "checkpoints score ~3.6 dB worse through that "
                        "walk than through the pristine sidestep "
                        "(sw3 stream_eval.json); this trains the "
                        "handoff itself: window k's target becomes "
                        "target_k - stop_grad(window k-1's decoded "
                        "second half), subtracted in the TIME domain "
                        "before the fade (the walk's exact convention, "
                        "models/siam.py handoff_window_step). The first "
                        "N steps stay pristine as a curriculum (an "
                        "untrained previous window's residual is just "
                        "the target plus noise)")
    p.add_argument("--walk-eval-every", type=int, default=0,
                   help="every N steps, run the COMPOSED default-mode "
                        "streaming walk (time-domain residual handoff + "
                        "refit) over the whole segment and log full-"
                        "segment SNR/LSD — the deployment metric. Saves "
                        "walk_best.pkl/recon_walk_best.wav at each new "
                        "best. 0 = off")
    p.add_argument("--b2", type=float, default=0.999,
                   help="Adam beta2. The r3 divergence storms were "
                        "optimizer cliffs (finite gradients, gnorm 3e13 "
                        "at frozen params — nan_hunt4.json): Adam's "
                        "second moment at 0.999 is a 1000-step average, "
                        "so a rare huge gradient on the piecewise "
                        "greedy-selection objective produces an update "
                        "~g/sqrt(v) thousands of times larger than "
                        "steady state. 0.95 adapts v within ~20 steps "
                        "(the standard large-model stability setting)")
    p.add_argument("--trust-ratio", type=float, default=0.0,
                   help="per-parameter-leaf trust-ratio clip: scale "
                        "each leaf's Adam update so ||update|| <= "
                        "ratio * ||param|| (0 = off). Bounds what any "
                        "single cliff step can do to a layer "
                        "regardless of gradient scale; 0.1 caps a step "
                        "at 10%% of the layer's norm")
    p.add_argument("--gain-reg", type=float, default=0.0,
                   help="with --gain-refit, add this weight * "
                        "mean((gains-1)^2) to the loss. The r3 wire "
                        "codec's raw decode was -0.147 dB while the "
                        "refit decode hit 12.19 dB with |gains| at the "
                        "±10 clip — the trained amplitudes were 10x "
                        "miscalibrated and the 2-scalar/event wire "
                        "refinement was load-bearing. Pulling the "
                        "refit gains toward 1 makes the RAW decode "
                        "approach the refit one (0 = off)")
    p.add_argument("--balance-windows", action="store_true",
                   help="with --stream-windows N, give the window with "
                        "the worst eval SNR one extra training visit per "
                        "rotation (run sw3 converged 11.3/10.1/5.7 dB "
                        "per-window under uniform rotation, and the "
                        "composed streaming walk is bound by the worst "
                        "window). Deterministic; same compiled program")
    p.add_argument("--stream-windows", type=int, default=1,
                   help="train on N half-overlapped window positions of "
                        "a longer segment instead of one fixed window. "
                        "Single-window overfit leaves every other "
                        "position of the decode-time streaming walk "
                        "out-of-distribution (the measured 9.98 dB "
                        "first-half vs 3.08 dB second-half split); with "
                        "N>1 every window the walk visits is trained. "
                        "Matches how the reference consumes the codec "
                        "(iterativedecomposition.py:275-319); 1 = the "
                        "classic one-window existence proof")
    p.add_argument("--fixed-noise", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--n-samples-log2", type=int, default=0,
                   help="override segment length (0 = config default); "
                        "with --n-events/--hidden/--context-dim this "
                        "gives intermediate capacity points between "
                        "--tiny and the full reference config (e.g. a "
                        "CPU-sized medium run while the TPU relay is "
                        "down)")
    p.add_argument("--n-events", type=int, default=0)
    p.add_argument("--audio-events", type=int, default=0,
                   help="override the synthetic target's audio-event "
                        "count (default 8/sec ~= 47 events at 2^17 — "
                        "note that UNDER-provisions the 32-event codec; "
                        "a capacity-matched run sets this <= n_events)")
    p.add_argument("--hidden", type=int, default=0)
    p.add_argument("--context-dim", type=int, default=0)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--out", type=str, default="trained_weights/siam_overfit")
    p.add_argument("--watchdog-s", type=int, default=12600)
    p.add_argument("--stall-s", type=int, default=2400)
    p.add_argument("--target-snr", type=float, default=0.0,
                   help="stop early once first-half SNR exceeds this (dB); "
                        "0 disables")
    p.add_argument("--eval-catastrophe-db", type=float, default=6.0,
                   help="restore the best-eval snapshot only when an "
                        "eval falls THIS far below best (a silence-"
                        "basin fall), halving lr WITHOUT the floor — "
                        "under --fixed-noise training is deterministic, "
                        "so a restore that changes nothing repeats the "
                        "same trajectory forever (observed: a floored "
                        "restore loop froze every metric for 400+ "
                        "steps). Milder regressions just wander; the "
                        "EMA and best-artifact tracking keep the peak")
    p.add_argument("--eval-regress-db", type=float, default=0.0,
                   help="roll back to the best-eval snapshot and halve the "
                        "lr multiplier when an eval's first-half SNR drops "
                        "this many dB below the best seen (0 disables). "
                        "Two r3 runs at lr 3e-4 climbed to ~2.5 dB by step "
                        "~400 then fell into the mag-loss silence basin "
                        "within ~40 steps with total loss RISING 3x — an "
                        "optimizer instability, not a better optimum; this "
                        "makes progress monotone-ish under it")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--spectral-skip", action="store_true",
                   help="SIAMModel.spectral_skip (round-5 "
                        "generalization A/B — see model docstring)")
    p.add_argument("--refit-stop-grad", action="store_true",
                   help="treat OMP refit gains as constants in backward "
                        "(see refit_recon - the ill-conditioned-solve "
                        "inf source)")
    p.add_argument("--vec-clamp", type=float, default=0.0,
                   help="STE clip of event vectors (see "
                        "SIAMModel.vec_clamp - the window-1 saturation "
                        "catch-22)")
    p.add_argument("--lr-floor", type=float, default=0.0,
                   help="minimum lr_mult under rollback halvings (0 = "
                        "unbounded). sw6 leg 2: repeated cliff-adjacent "
                        "storms halved lr_mult to 5e-4 - the ok-gate "
                        "skips poisoned updates and rollbacks restore "
                        "verified states, so a floor trades slower "
                        "cliff escape for not starving the healthy "
                        "regime between storms")
    p.add_argument("--lr-recover-steps", type=int, default=250,
                   help="clean steps between lr_mult doublings after "
                        "rollback halvings (sw6: recovery from 1e-4 at "
                        "250 takes ~3k clean steps - too slow when "
                        "benign spike clusters keep halving)")
    p.add_argument("--spectral-filter", action="store_true",
               help="SIAMModel.spectral_filter: analysis-driven "
                    "zero-phase source-filter stage (round-5 arm C; "
                    "see model docstring)")
    p.add_argument("--grad-anatomy-from", type=int, default=0,
                   help="from this iter on, fetch PER-LEAF gradient "
                        "norms every step into out/grad_anatomy.jsonl "
                        "(cliff forensics; deterministic replay under "
                        "--fixed-noise). Probe runs only — costs a "
                        "second backward per step")
    p.add_argument("--commit-artifacts", action="store_true",
                   help="git-commit metrics.json (every eval) and the "
                        "best-checkpoint pkls (rate-limited, 15 min) so "
                        "a VM reset cannot destroy a finished run "
                        "(ROADMAP round-4 artifact-loss policy)")
    p.add_argument("--holdout-eval", action="store_true",
                   help="also score an UNSEEN dense-synthetic segment "
                        "(seed space disjoint from --seed) at every "
                        "eval: holdout first-half SNR/LSD/PIF ride in "
                        "the eval series, so full-config runs measure "
                        "the generalization trajectory for free "
                        "(VERDICT r4 item 6)")
    p.add_argument("--init-from", type=str, default=None,
                   help="load PARAMS (not opt state or step) from this "
                        "checkpoint file before training — e.g. warm-"
                        "start a fresh run from another run's "
                        "ema_best.pkl")
    args = p.parse_args()

    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)
    os.makedirs(args.out, exist_ok=True)

    if args.selection_leak or args.selection_floor:
        # must run BEFORE the model is built/jitted: jitted programs
        # capture the values at trace time (mptpu/sparse/quantize.py)
        from mptpu.sparse.quantize import set_selection_leak, set_selection_floor

        set_selection_leak(args.selection_leak)
        set_selection_floor(args.selection_floor)

    if args.tiny:
        n_samples, n_events, hidden, context_dim = 2**13, 4, 32, 16
        window, step_sz = 512, 256
    else:
        n_samples, n_events, hidden, context_dim = 2**17, 32, 128, 32
        window, step_sz = 2048, 256
    if args.n_samples_log2:
        n_samples = 2 ** args.n_samples_log2
    n_events = args.n_events or n_events
    hidden = args.hidden or hidden
    context_dim = args.context_dim or context_dim

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
        vec_clamp=args.vec_clamp,
    )

    # ONE fixed dense segment (reference --overfit repeats one batch,
    # datastore.py:136-140); synthesized because no MusicNet is mounted
    from mptpu.data.synthetic import synthetic_audio

    half = n_samples // 2
    n_win = max(1, args.stream_windows)
    total_len = n_samples + (n_win - 1) * half
    base_events = args.audio_events or int(n_samples / 22050 * 8)
    seg = synthetic_audio(
        total_len, 22050,
        n_events=int(round(base_events * total_len / n_samples)),
        seed=args.seed, sustained=True,
    )
    # training windows at the streaming walk's half-overlap offsets
    # (n_win == 1 reproduces the classic single-window setup exactly)
    from mptpu.data import streaming_windows

    targets = jnp.asarray(
        streaming_windows(seg, n_samples, n_win)
    ).reshape(n_win, 1, 1, n_samples)
    target = targets[0]
    write_wav(os.path.join(args.out, "target.wav"), seg, 22050)

    holdout = None
    if args.holdout_eval:
        # UNSEEN content: same generator, seed space disjoint from any
        # plausible --seed (the quality runs' holdout convention,
        # scripts/siam_quality.py seed_offset=1000) — scored but never
        # trained on, so full-config runs chart generalization for free
        ho_seg = synthetic_audio(
            n_samples, 22050, n_events=base_events,
            seed=args.seed + 100000, sustained=True,
        )
        holdout = jnp.asarray(ho_seg).reshape(1, 1, n_samples)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, target, key)
    opt = optimizer(lr=args.lr, b1=0.9, b2=args.b2)
    trust_clip = trust_ratio_clip(args.trust_ratio) if args.trust_ratio else None
    trust_state = optax.EmptyState()
    opt_state = opt.init(params)
    ckpt = CheckpointManager(args.out, every=250)
    start_step = 0
    if args.init_from:
        from mptpu.train.checkpoint import load_checkpoint

        payload = load_checkpoint(args.init_from)
        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        print(
            f"params initialized from {args.init_from} "
            f"(step {payload['step']})",
            flush=True,
        )
    if args.resume:
        payload = ckpt.latest()
        if payload is not None:
            params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
            if payload["opt_state"] is not None:
                opt_state = jax.tree_util.tree_map(jnp.asarray, payload["opt_state"])
            start_step = payload["step"] + 1
            print(f"resumed from step {payload['step']}", flush=True)

    iterative = make_iterative_fn(model)

    # second-half fade (iterativedecomposition.py:519-524): the encoder's
    # streaming mask hides the second half, so content there would push
    # every event toward silence; SNR is evaluated on the first half.
    # fade_tail is the shared codec analysis-window definition — decode
    # paths (pristine walk, codec_rate) must present windows the same way
    fade = fade_tail(n_samples)
    faded_targets = targets * fade
    faded_target = faded_targets[0]
    tgt_energy_halves = jnp.sum(targets[..., :half] ** 2, axis=(-1, -2, -3))
    target_energy_half = tgt_energy_halves[0]

    noise_key = jax.random.PRNGKey(42)

    from mptpu.models.siam import refit_event_gains

    def refit_recon(channels, tgt):
        """First-half OMP gain re-fit (clipped in the TRAINER only: the
        mag loss anchors channel scale near the right amplitude, so
        honest gains sit near 1; the clip is insurance against the
        tiny-channel/huge-gain scale degeneracy early in training)."""
        gains = refit_event_gains(
            tgt, channels, ridge=args.gain_refit, span=half
        )
        gains = jnp.clip(gains, -10.0, 10.0)
        if args.refit_stop_grad:
            # sw6 leg-5 forensics: a window whose events have collapsed
            # to near-collinear channels makes the E x E refit solve
            # ill-conditioned; its FORWARD is clip-guarded but the
            # BACKWARD through jnp.linalg.solve is not, and ~70% of that
            # window's training steps went non-finite (permanently
            # no-op'd by the ok-gate). Treating the refit gains as
            # constants (OMP-refit-as-STE) bounds the backward: the
            # waveform gradient reaches channels scaled by the CLIPPED
            # gains, and the mag loss still anchors absolute scale.
            gains = jax.lax.stop_gradient(gains)
        return jnp.einsum("be,ben->bn", gains, channels)[:, None], gains

    # (refit_recon takes the window's own target when --stream-windows>1)

    def loss_fn(params, key, wave_w, f_tgt, tgt, tgt_e_half):
        channels, vecs, schedules, _ = iterative(params, f_tgt, key)
        mag = iterative_loss(
            f_tgt,
            channels,
            lambda x: siam_transform(x, window, step_sz, mag_epsilon=1e-6),
        )
        raw = jnp.sum(channels, axis=1, keepdims=True)
        recon = raw
        loss = mag
        if args.gain_refit:
            recon, gains = refit_recon(channels, tgt)
            if args.gain_reg:
                # amplitude calibration: push the refit gains toward 1
                # so the RAW decode converges to the refit decode (the
                # r3 wire codec's raw decode was negative-SNR while the
                # refit hit 12 dB — gains at the ±10 clip). Only alive
                # events count: a dead channel's gain is ~0 by the
                # ridge, and penalizing it would fight selection_floor
                alive = (
                    jnp.sum(channels[..., :half] ** 2, axis=-1) > 1e-12
                )
                loss = loss + args.gain_reg * jnp.sum(
                    jnp.where(alive, (gains - 1.0) ** 2, 0.0)
                ) / jnp.maximum(jnp.sum(alive), 1)
        # relative waveform error on the (covered) first half
        wave = jnp.sum(
            (recon[..., :half] - tgt[..., :half]) ** 2
        ) / jnp.maximum(tgt_e_half, 1e-12)
        # wave_w is a TRACED scalar so the weight can change (or ramp)
        # without recompiling the program over the remote relay
        loss = loss + wave_w * wave
        # the decode-time walk hands window k+1 the RAW second half of
        # this window's decode (stop-grad data for handoff training)
        raw_tail = jax.lax.stop_gradient(raw[..., half:])
        return loss, (recon, wave, raw_tail)

    @jax.jit
    def train_step(params, opt_state, ema, key, wave_w, clip, lr_mult,
                   f_tgt, tgt, tgt_e_half):
        (loss, (recon, wave, raw_tail)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, key, wave_w, f_tgt, tgt, tgt_e_half)
        gnorm = optax.global_norm(grads)
        # clip and lr_mult are TRACED so divergence recovery can tighten
        # them mid-run without paying a remote recompile
        scale = lr_mult * jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = opt.update(grads, opt_state, params)
        if args.trust_ratio:
            # per-leaf optimizer-cliff bound (nan_hunt4: finite grads,
            # gnorm 3e13 at frozen params; global-norm clipping still
            # lets one layer absorb the whole clipped budget) — see
            # mptpu.train.trust_ratio_clip for the full anatomy
            updates, _ = trust_clip.update(updates, trust_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        # a non-finite step's decode must not poison the handoff chain:
        # zero tail = one pristine-input rotation for the next window
        raw_tail = jnp.where(ok, raw_tail, jnp.zeros_like(raw_tail))
        params_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
        )
        if args.ema:
            ema = jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    ok, args.ema * e + (1.0 - args.ema) * p, e
                ),
                ema,
                params_out,
            )
        return params_out, opt_out, ema, loss, wave, gnorm, ok, raw_tail

    @jax.jit
    def reconstruct(params, key, f_tgt, tgt):
        channels, _, schedules, _ = iterative(params, f_tgt, key)
        # per-event first-half energy: the overfit4 plateau was 29/32
        # events rendering EXACTLY zero (diag.json), invisible in every
        # scalar we logged — count alive events at each eval
        ev_energy = jnp.sum(channels[..., :half] ** 2, axis=-1)
        raw = jnp.sum(channels, axis=1, keepdims=True)
        refit = refit_recon(channels, tgt)[0] if args.gain_refit else raw
        if args.align_refine:
            from mptpu.models.siam import refine_event_alignment

            refined, _, gains = refine_event_alignment(
                tgt,
                channels,
                max_shift=args.align_refine,
                n_iters=2,
                ridge=args.gain_refit or 1e-3,
                span=half,
            )
            aligned = jnp.einsum("be,ben->bn", gains, refined)[:, None]
        else:
            aligned = refit
        return raw, refit, aligned, jnp.max(schedules), ev_energy

    metrics = {
        "config": (
            f"overfit 1 segment seed {args.seed}, n_samples 2^"
            f"{int(np.log2(n_samples))}, {n_events} events, STFT "
            f"{window}/{step_sz}, lr {args.lr}, attn_floor "
            f"{args.attn_floor}, attn_leak {args.attn_leak}, "
            f"waveform_weight {args.waveform_weight}, fixed_noise "
            f"{args.fixed_noise}, switch_bias_init {args.switch_bias_init}, "
            f"selection_leak {args.selection_leak}, "
            f"selection_floor {args.selection_floor}, "
            f"eval_regress_db {args.eval_regress_db}, "
            f"gain_refit {args.gain_refit}, "
            f"align_refine {args.align_refine}, ema {args.ema}, "
            f"audio_events {args.audio_events or 'default(8/sec)'}, "
            f"stream_windows {n_win}, "
            f"residual_handoff {args.residual_handoff}, "
            f"balance_windows {args.balance_windows}, "
            f"b2 {args.b2}, trust_ratio {args.trust_ratio}, "
            f"spectral_skip {args.spectral_skip}, "
            f"vec_clamp {args.vec_clamp}, "
            f"spectral_filter {args.spectral_filter}, "
            f"gain_reg {args.gain_reg}"
        ),
        "eval": [],
        "losses": [],
    }
    if args.resume:
        try:
            with open(os.path.join(args.out, "metrics.json")) as f:
                prior = json.load(f)
            metrics["eval"] = prior.get("eval", [])
            metrics["losses"] = prior.get("losses", [])
            if prior.get("walk"):
                metrics["walk"] = prior["walk"]
            # MODEL-SEMANTIC flags must survive a resume: sw6's resume
            # legs silently dropped --spectral-skip (flax ignores the
            # stale extra params), forking the encode semantics mid-
            # lineage. Flags that change the traced model are compared
            # against the recorded config line and mismatches are LOUD.
            pc = prior.get("config", "")
            for flag, cur in (
                ("spectral_skip", args.spectral_skip),
                ("spectral_filter", args.spectral_filter),
            ):
                if f"{flag} {not cur}" in pc:
                    print(
                        f"WARNING: --resume with {flag}={cur} but the "
                        f"run was recorded with {flag}={not cur} — the "
                        "model semantics FORK here (stale params are "
                        "silently ignored by flax). Pass the original "
                        "flag unless the fork is intentional.",
                        flush=True,
                    )
        except (IOError, ValueError):
            pass

    def write_metrics():
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            dump_json(metrics, f, indent=1)
        commit_artifacts()

    last_artifact_commit = [0.0]

    def commit_artifacts(paths=(), force=False):
        """--commit-artifacts: the repo is the only storage that
        survives VM resets (two resets have each destroyed finished-run
        artifacts — ROADMAP.md round-4 policy, VERDICT r4 item 5).
        metrics.json rides along every eval write; checkpoints are
        rate-limited to one commit per 15 min."""
        if not args.commit_artifacts:
            return
        import subprocess

        now = time.time()
        to_add = [os.path.join(args.out, "metrics.json")]
        slog = os.path.join(args.out, "storm.log")
        if os.path.exists(slog):
            to_add.append(slog)
        if paths and (force or now - last_artifact_commit[0] > 900):
            to_add += [p for p in paths if os.path.exists(p)]
            last_artifact_commit[0] = now
        try:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            subprocess.run(["git", "-C", repo, "add", "-f"] + to_add,
                           check=False, capture_output=True, timeout=60)
            r = subprocess.run(
                ["git", "-C", repo, "commit", "-q", "-m",
                 f"run artifacts: {os.path.basename(args.out)} step {last_i}"],
                check=False, capture_output=True, timeout=60,
            )
            _ = r
        except Exception as e:  # never let bookkeeping kill a run
            print(f"commit_artifacts failed: {e}", flush=True)

    run_start = time.perf_counter()
    best_snr = -np.inf
    best_aligned = -np.inf
    best_artifact = -np.inf  # best recon saved to disk (params OR ema)
    best_ema = -np.inf       # best EMA state (its own checkpoint file)
    nan_steps = 0
    regress_rollbacks = 0
    good_streak = 0
    lr_mult = 1.0
    worst_window = -1  # --balance-windows target; set at each eval
    # Storm policy lives in mptpu.train.guard.StormGuard (extracted from
    # this script's inline sw5-era logic so the cliff machinery is unit-
    # testable — tests/test_storm_guard.py replays the sw5 storm cadence
    # deterministically; VERDICT r4 item 7). The guard owns spike
    # classification, hindsight snapshot promotion, and the consecutive-
    # rollback abort counter; this loop owns the expensive restores.
    guard = StormGuard(
        grad_clip=args.grad_clip, loss_catastrophe=args.spike_thresh
    )
    # divergence insurance seed: snapshot (refs, zero copy cost) of the
    # starting params/opt_state. Later targets require VERIFIED health
    # (finite forward AND sched_max well below the switch clamp): the
    # first r3 run's eval snapshot captured already-poisoned params
    # (loss 44.78 looked fine while sched_max sat at the clamp and SNR
    # was -24.9 dB), so a healthy-looking loss is NOT sufficient.
    guard.set_initial((params, opt_state), start_step)
    # separate snapshot for eval-SNR regression recovery: the 50-step
    # health snapshot above accepts any finite/clamp-clear state, which
    # after a collapse is exactly the silent state we must NOT return to
    best_eval = (params, opt_state, start_step)

    def rollback(i):
        """Restore the guard's rollback target. Returns True on abort
        (consecutive-failure budget exhausted)."""
        nonlocal params, opt_state, ema, lr_mult, good_streak, \
            perturb_until, last_rb_step
        (params, opt_state), good_step = guard.rollback_target()
        abort = guard.note_rollback()
        ema = params  # drop a possibly-poisoned average
        lr_mult = max(lr_mult * 0.5, args.lr_floor)
        good_streak = 0
        extra = ""
        if good_step == last_rb_step and args.fixed_noise:
            # repeat rollback to the SAME snapshot: under --fixed-noise
            # the objective is deterministic in params, so lr-halving
            # alone can replay the identical cliff (medium2 died with
            # the BAD loss bit-identical across rollbacks, 910482.50
            # twice). Detour through the stochastic objective for a few
            # steps to leave the cliff's basin, then return.
            perturb_until = i + 30
            extra = "; perturbing step key for 30 steps"
        last_rb_step = good_step
        # handoff tails rendered by poisoned params must not feed the
        # restored model; pristine inputs for one rotation refill them
        for k in range(len(handoff_tails)):
            handoff_tails[k] = None
        print(
            f"ROLLBACK #{guard.total_rollbacks} at iter {i} to step "
            f"{good_step}; lr_mult -> {lr_mult:g}{extra}",
            flush=True,
        )
        return abort

    last_i = start_step
    # EMA restarts from the (possibly resumed) params — it is an
    # eval-side average, not training state, so it is not checkpointed
    ema = params
    perturb_until = start_step  # see rollback(): fixed-noise cliff detour
    last_rb_step = -1

    # --residual-handoff: handoff_tails[k] is the RAW decoded second
    # half of window k-1's most recent forward (stop-grad device array)
    # — exactly what the decode-time walk subtracts from window k's
    # first half (models/siam.py handoff_window_step). One rotation
    # stale; refilled within n_win steps. Index 0 is never used
    # (window 0 has no predecessor).
    handoff_tails: list = [None] * n_win

    def clear_handoff():
        for k in range(n_win):
            handoff_tails[k] = None

    def window_inputs(w, i):
        """(faded_input, wave_target, first-half energy) for window w —
        residual-handoff form once the curriculum has elapsed."""
        tail = (
            handoff_tails[w]
            if (
                args.residual_handoff
                and n_win > 1
                and w > 0
                and i >= args.residual_handoff
            )
            else None
        )
        if tail is None:
            return faded_targets[w], targets[w], tgt_energy_halves[w]
        tgt_w = targets[w].at[..., :half].add(-tail)
        return (
            tgt_w * fade,
            tgt_w,
            jnp.sum(tgt_w[..., :half] ** 2),
        )

    # composed-walk eval (--walk-eval-every): the deployment metric —
    # the DEFAULT time-domain residual-handoff walk over the full
    # segment, scored like scripts/overfit_stream_eval.py (final half
    # faded, one window of silence padded so the walk tiles past the
    # end, refit+align applied as the wire codec does)
    best_walk = -np.inf
    if args.walk_eval_every:
        from mptpu.models.siam import make_streaming_fn

        walk_stream = make_streaming_fn(model)
        walk_target = jnp.asarray(seg).reshape(1, 1, total_len)
        walk_target = walk_target.at[..., total_len - half:].multiply(
            jnp.linspace(1.0, 0.0, half) ** 8
        )
        walk_padded = jnp.pad(
            walk_target, ((0, 0), (0, 0), (0, n_samples))
        )
        metrics.setdefault("walk", [])

    grad_leaf_norms = None
    anatomy_f = None
    if args.grad_anatomy_from:
        # cliff forensics (VERDICT r4 item 3): under --fixed-noise the
        # iter-~153 full-config storm reproduces deterministically, so
        # replaying the first ~200 steps with per-leaf gradient norms
        # fetched every step names WHICH parameter leaf carries the
        # spike (global gnorm hides it: nan_hunt4 saw finite leaves and
        # gnorm 3e13). Costs a second backward + a host sync per step —
        # probe runs only.
        @jax.jit
        def grad_leaf_norms(params, key, wave_w, f_tgt, tgt, tgt_e_half):
            grads = jax.grad(loss_fn, has_aux=True)(
                params, key, wave_w, f_tgt, tgt, tgt_e_half
            )[0]
            return jax.tree_util.tree_map(
                lambda g: jnp.sqrt(jnp.sum(g * g)), grads
            )

        anatomy_f = open(os.path.join(args.out, "grad_anatomy.jsonl"), "a")

    pending = None  # (i, loss, wave, gnorm, ok) of the PREVIOUS step
    nonfinite_iters: list[int] = []
    for i in range(start_step, args.iterations):
        last_i = i
        step_key = (
            noise_key
            if args.fixed_noise and i >= perturb_until
            else jax.random.fold_in(key, i)
        )
        if args.balance_windows and n_win > 1 and worst_window >= 0:
            # rotation of length n_win+1: the uniform pass plus one
            # extra visit to the currently-worst window (updated at
            # every eval from window_snr_db)
            r = i % (n_win + 1)
            w = worst_window if r == n_win else r
        else:
            w = i % n_win
        f_tgt_w, tgt_w, tgt_e_w = window_inputs(w, i)
        if anatomy_f is not None and i >= args.grad_anatomy_from:
            norms = grad_leaf_norms(
                params, step_key, jnp.float32(args.waveform_weight),
                f_tgt_w, tgt_w, tgt_e_w,
            )
            flat = {
                jax.tree_util.keystr(kp): float(v)
                for kp, v in jax.tree_util.tree_flatten_with_path(norms)[0]
            }
            anatomy_f.write(json.dumps(
                {"iter": i, "window": w, "leaf_gnorms": flat}
            ) + "\n")
            anatomy_f.flush()
        params, opt_state, ema, loss, wave, gnorm, ok, raw_tail = train_step(
            params, opt_state, ema, step_key,
            jnp.float32(args.waveform_weight),
            jnp.float32(args.grad_clip),
            jnp.float32(lr_mult),
            f_tgt_w, tgt_w, tgt_e_w,
        )
        if args.residual_handoff and n_win > 1 and w + 1 < n_win:
            # this window's decoded tail is the next window's handoff
            # input (device array, fetched lazily — no sync here)
            handoff_tails[w + 1] = raw_tail
        # every-step health check, pipelined: float() the PREVIOUS step's
        # scalars while this step runs on device — a synchronous per-step
        # fetch serializes the remote relay and cost ~4x step time
        # (measured r3 run #3). Detection lags one step; rollback restores
        # a verified snapshot, so one extra poisoned update is harmless.
        this = (i, loss, wave, gnorm, ok)
        if pending is None:
            pending = this
            continue
        ci, loss, wave, gnorm, ok = pending
        pending = this
        l = float(loss)
        g = float(gnorm)
        nan_steps += int(not bool(ok))
        if not bool(ok):
            # non-finite forward/backward: the ok-gate already SKIPPED
            # the update (params and opt_state unchanged) and the
            # handoff tail was zeroed on device, so this step is a
            # provable no-op — the reference's own policy is to skip
            # such batches and continue (iterativedecomposition.py:
            # 535-540). Rolling back + halving lr here is what ABORTED
            # sw6 leg 3: 12 no-op storms from one cliff-adjacent (but
            # healthy, 5.7 dB) state. Only a high RATE of non-finite
            # steps is pathological (the model sits in a basin where
            # most window visits blow up) — then roll back.
            nonfinite_iters.append(ci)
            nonfinite_iters[:] = [t for t in nonfinite_iters
                                  if ci - t <= 100]
            if len(nonfinite_iters) > 40:
                print(
                    f"iter {ci} non-finite RATE pathological "
                    f"({len(nonfinite_iters)}/100 recent) — rolling back",
                    flush=True,
                )
                nonfinite_iters.clear()
                aborted = rollback(ci)
                pending = None
                if aborted:
                    print("ABORT: persistent divergence", flush=True)
                    metrics["aborted"] = True
                    break
            elif ci % 5 == 0:
                print(f"iter {ci} non-finite step skipped (no-op)",
                      flush=True)
            continue
        verdict = guard.classify(ci, l, g, bool(ok))
        if verdict == StormGuard.SPIKE:
            print(
                f"iter {ci} transient spike tolerated: loss {l:.2f} "
                f"gnorm {g:.1f}",
                flush=True,
            )
        elif verdict == StormGuard.BAD:
            if guard.last_escalation_iter == ci:
                print(
                    f"iter {ci} second spike within "
                    f"{guard.near_window} steps (gnorm {g:.1f}) — "
                    f"escalating cliff, treating as poisoning",
                    flush=True,
                )
            print(
                f"iter {ci} BAD: loss {l:.2f} gnorm {g:.1f} "
                f"ok {bool(ok)}",
                flush=True,
            )
            aborted = rollback(ci)
            # the in-flight step's stats describe pre-rollback params;
            # checking them next iteration would re-trigger immediately
            pending = None
            if aborted:
                print("ABORT: persistent divergence", flush=True)
                metrics["aborted"] = True
                break
            continue
        good_streak += 1
        if good_streak >= args.lr_recover_steps and lr_mult < 1.0:
            lr_mult = min(1.0, lr_mult * 2.0)
            good_streak = 0
            print(f"lr_mult recovered -> {lr_mult:g}", flush=True)
        if ci % 25 == 0:
            faulthandler.cancel_dump_traceback_later()
            faulthandler.dump_traceback_later(args.stall_s, exit=True)
            metrics["losses"].append([ci, round(l, 2)])
            print(
                f"iter {ci} loss {l:.2f} wave {float(wave):.4f} "
                f"gnorm {g:.1f} lr_mult {lr_mult:g}",
                flush=True,
            )
        if i % 50 == 0 and i > start_step:
            # snapshot only a VERIFIED-healthy state: finite forward and
            # switches clearly away from the clamp (an extra forward,
            # ~1% overhead at this cadence)
            _, _, _, snap_sched, _ = reconstruct(
                params,
                noise_key if args.fixed_noise else jax.random.PRNGKey(7),
                faded_target, target,
            )
            at_clamp = float(snap_sched) >= 0.8 * args.switch_clamp
            if not at_clamp:
                # hindsight snapshot promotion (sw5: a snapshot captured
                # mid-spike trapped every rollback at the cliff's edge;
                # promotion waits a full boundary window, isolated
                # single spikes don't block it) — StormGuard docstring
                ev = guard.healthy_boundary(i, (params, opt_state))
                if ev.startswith("promoted"):
                    print(
                        f"iter {i} hindsight snapshot promoted "
                        f"(rollback target now step {guard.good[1]})",
                        flush=True,
                    )
                elif ev.startswith("discarded"):
                    print(
                        f"iter {i} snapshot candidate discarded "
                        f"(escalation at {guard.last_escalation_iter})",
                        flush=True,
                    )
                if ev.endswith("+deferred"):
                    print(
                        f"iter {i} candidate capture deferred (spike at "
                        f"{guard.last_spike_iter})",
                        flush=True,
                    )
            else:
                # a switch riding its clamp IS poisoning (r3 run #1's
                # failure mode) even while the loss still looks finite
                print(
                    f"iter {i} switch at clamp (sched_max "
                    f"{float(snap_sched):.2f}) — rolling back",
                    flush=True,
                )
                aborted = rollback(i)
                pending = None
                if aborted:
                    print("ABORT: persistent divergence", flush=True)
                    metrics["aborted"] = True
                    break
                continue
        if i % args.eval_every == 0:
            eval_key = noise_key if args.fixed_noise else jax.random.PRNGKey(7)
            raw_recon, recon, aligned_recon, sched_max, ev_energy = (
                reconstruct(params, eval_key, faded_target, target)
            )
            tgt_e = float(target_energy_half)
            alive = int(np.sum(np.asarray(ev_energy) > 1e-6 * tgt_e))
            s_half = float(snr_db(target[..., :half], recon[..., :half]))
            l_half = float(lsd_db(target[..., :half], recon[..., :half],
                                  window, step_sz))
            s_full = float(snr_db(target, recon))
            p_half = pif_dist(target[..., :half], recon[..., :half])
            entry = {
                "step": i,
                "first_half_snr_db": round(s_half, 3),
                "first_half_lsd_db": round(l_half, 3),
                "first_half_pif_dist": round(p_half, 4),
                "full_snr_db": round(s_full, 3),
                "sched_max": round(float(sched_max), 4),
                "alive_events": alive,
                "nan_steps_so_far": nan_steps,
                "lr_mult": lr_mult,
                "rollbacks": guard.total_rollbacks,
                "regress_rollbacks": regress_rollbacks,
            }
            if args.gain_refit:
                # first_half_snr_db above IS the refit number when the
                # refit is on (it is part of decode then); keep the raw
                # unit-gain SNR beside it so divergence between the two
                # (scale degeneracy) is visible in the series
                entry["raw_first_half_snr_db"] = round(
                    float(snr_db(target[..., :half], raw_recon[..., :half])),
                    3,
                )
            if holdout is not None:
                # generalization trajectory (VERDICT r4 item 6): encode/
                # decode an unseen segment with the current params; the
                # refit path is part of decode when --gain-refit is on
                _, ho_recon, _, _, _ = reconstruct(
                    params, eval_key, holdout * fade, holdout
                )
                entry["holdout_first_half_snr_db"] = round(float(
                    snr_db(holdout[..., :half], ho_recon[..., :half])), 3)
                entry["holdout_first_half_lsd_db"] = round(float(
                    lsd_db(holdout[..., :half], ho_recon[..., :half],
                           window, step_sz)), 3)
                entry["holdout_first_half_pif_dist"] = round(
                    pif_dist(holdout[..., :half], ho_recon[..., :half]), 4)
            if n_win > 1:
                # per-window first-half SNR: every position the decode
                # walk visits, scored on ITS window's covered half.
                # Once --residual-handoff is active, windows > 0 are
                # scored on their RESIDUAL inputs/targets (what the
                # walk actually hands them); entry["handoff"] marks the
                # semantics switch in the series
                handoff_live = bool(
                    args.residual_handoff and i >= args.residual_handoff
                )
                entry["handoff"] = handoff_live
                wsnrs = [round(s_half, 3)]
                for wi in range(1, n_win):
                    wf_tgt, wtgt, _ = window_inputs(wi, i)
                    _, w_recon, _, _, _ = reconstruct(
                        params, eval_key, wf_tgt, wtgt
                    )
                    wsnrs.append(round(float(snr_db(
                        wtgt[..., :half], w_recon[..., :half]
                    )), 3))
                entry["window_snr_db"] = wsnrs
                worst_window = int(np.argmin(wsnrs))
            if args.ema:
                # best_snr stays TRAINING-params-only (it drives the
                # eval-regress rollback; letting the usually-higher EMA
                # number into it would rollback healthy training) — the
                # averaged params compete only for the artifact below
                _, e_recon, _, _, _ = reconstruct(
                    ema, eval_key, faded_target, target
                )
                e_half = float(
                    snr_db(target[..., :half], e_recon[..., :half])
                )
                entry["ema_first_half_snr_db"] = round(e_half, 3)
                # artifact SELECTION keys on the mean over all trained
                # windows, not window 0 alone — window-0-only selection
                # biased saved checkpoints against later walk positions
                # (run sw3: per-window 11.3/10.1/5.7 dB; the composed
                # streaming walk is bound by the WORST window)
                e_sel = e_half
                if n_win > 1:
                    e_wins = [e_half]
                    for wi in range(1, n_win):
                        wf_tgt, wtgt, _ = window_inputs(wi, i)
                        _, ew_recon, _, _, _ = reconstruct(
                            ema, eval_key, wf_tgt, wtgt
                        )
                        e_wins.append(float(snr_db(
                            wtgt[..., :half], ew_recon[..., :half]
                        )))
                    e_sel = sum(e_wins) / len(e_wins)
                    entry["ema_mean_window_snr_db"] = round(e_sel, 3)
                if e_sel > best_ema:
                    # ema_best tracks the best EMA state on ITS OWN
                    # tracker (keying off the global best_artifact let a
                    # params peak block every later EMA save — observed:
                    # a run's ema_best.pkl froze at step 50).
                    # NOT ckpt_-prefixed: CheckpointManager.latest()
                    # sorts ckpt_* lexically and "ckpt_ema*" would
                    # shadow every numbered checkpoint on --resume
                    best_ema = e_sel
                    save_checkpoint(
                        os.path.join(args.out, "ema_best.pkl"),
                        ema, None, i,
                    )
                    commit_artifacts(
                        [os.path.join(args.out, "ema_best.pkl")]
                    )
                if e_sel > best_artifact:
                    best_artifact = e_sel
                    write_wav(
                        os.path.join(args.out, "recon_best.wav"),
                        np.asarray(e_recon[0, 0]), 22050,
                    )
            if args.align_refine:
                a_half = float(
                    snr_db(target[..., :half], aligned_recon[..., :half])
                )
                if a_half > best_aligned:
                    best_aligned = a_half
                    write_wav(
                        os.path.join(args.out, "recon_aligned_best.wav"),
                        np.asarray(aligned_recon[0, 0]), 22050,
                    )
                entry["aligned_first_half_snr_db"] = round(a_half, 3)
                entry["aligned_first_half_lsd_db"] = round(
                    float(
                        lsd_db(
                            target[..., :half],
                            aligned_recon[..., :half],
                            window,
                            step_sz,
                        )
                    ),
                    3,
                )
            metrics["eval"].append(entry)
            print("eval", json.dumps(entry), flush=True)
            write_metrics()
            # artifact selection: mean over trained windows (same scale
            # as the EMA path's e_sel). Evaluated OUTSIDE the
            # window-0-record gate below — a state with a better window
            # MEAN whose window-0 SNR is not a new record must still be
            # able to win the artifact (the r3 gating partially
            # defeated the selection fix; ADVICE r3)
            s_sel = sum(wsnrs) / len(wsnrs) if n_win > 1 else s_half
            if s_sel > best_artifact:
                best_artifact = s_sel
                write_wav(
                    os.path.join(args.out, "recon_best.wav"),
                    np.asarray(recon[0, 0]), 22050,
                )
            if s_half > best_snr:
                best_snr = s_half
                best_eval = (params, opt_state, i)
            elif (
                args.eval_regress_db
                and best_snr > 0.5
                and s_half < best_snr - args.eval_regress_db
            ):
                regress_rollbacks += 1
                catastrophic = s_half < best_snr - args.eval_catastrophe_db
                if catastrophic:
                    # a silence-basin fall: restore AND halve without the
                    # floor — under --fixed-noise the dynamics are
                    # deterministic, so the restore must change the lr
                    # or the same trajectory repeats forever
                    params, opt_state, be_step = best_eval
                    ema = params
                    lr_mult = max(lr_mult * 0.5, args.lr_floor)
                    good_streak = 0
                    # forget the abandoned trajectory: rollback target
                    # AND any pending snapshot candidate from the
                    # collapsing basin (ADVICE r4 medium finding)
                    guard.catastrophic_restore((params, opt_state), be_step)
                    pending = None
                    clear_handoff()
                    print(
                        f"EVAL-CATASTROPHE restore #{regress_rollbacks} "
                        f"at iter {i}: SNR {s_half:.2f} < best "
                        f"{best_snr:.2f} - {args.eval_catastrophe_db}; "
                        f"restored step {be_step}, lr_mult -> "
                        f"{lr_mult:g}",
                        flush=True,
                    )
                else:
                    # mild regression: plateau oscillation — keep going
                    # (the EMA and the best-artifact files hold the peak)
                    print(
                        f"eval regression #{regress_rollbacks} at iter "
                        f"{i}: SNR {s_half:.2f} vs best {best_snr:.2f} — "
                        "wandering on",
                        flush=True,
                    )
            if args.target_snr and s_half >= args.target_snr:
                print(f"target SNR {args.target_snr} dB reached", flush=True)
                break
        if (
            args.walk_eval_every
            and i % args.walk_eval_every == 0
            and i > start_step
        ):
            # score the EMA when present (it is the shipping artifact),
            # else the training params
            walk_params = ema if args.ema else params
            wkey = noise_key if args.fixed_noise else jax.random.PRNGKey(11)
            w_raw = walk_stream(
                walk_params, walk_padded, wkey, fixed_noise=args.fixed_noise
            )[..., :total_len]
            w_refit = walk_stream(
                walk_params, walk_padded, wkey, fixed_noise=args.fixed_noise,
                refit_gains_against=walk_padded,
                refit_ridge=args.gain_refit or 1e-3,
                align_refine=args.align_refine,
            )[..., :total_len]
            wentry = {
                "step": i,
                "raw_full_snr_db": round(
                    float(snr_db(walk_target, w_raw)), 3),
                "refit_full_snr_db": round(
                    float(snr_db(walk_target, w_refit)), 3),
                "refit_full_lsd_db": round(
                    float(lsd_db(walk_target, w_refit, window, step_sz)), 3),
                "refit_first_half_snr_db": round(float(snr_db(
                    walk_target[..., :half], w_refit[..., :half])), 3),
                "refit_second_half_snr_db": round(float(snr_db(
                    walk_target[..., half:], w_refit[..., half:])), 3),
                "refit_full_pif_dist": round(
                    pif_dist(walk_target, w_refit), 4),
                "source": "ema" if args.ema else "params",
            }
            metrics["walk"].append(wentry)
            print("walk", json.dumps(wentry), flush=True)
            write_metrics()
            if wentry["refit_full_snr_db"] > best_walk:
                best_walk = wentry["refit_full_snr_db"]
                save_checkpoint(
                    os.path.join(args.out, "walk_best.pkl"),
                    walk_params, None, i,
                )
                commit_artifacts(
                    [os.path.join(args.out, "walk_best.pkl")]
                )
                write_wav(
                    os.path.join(args.out, "recon_walk_best.wav"),
                    np.asarray(w_refit[0, 0]), 22050,
                )
        ckpt.maybe_save(i, params, opt_state)
        if time.perf_counter() - run_start > args.watchdog_s - 300:
            print("time budget reached — exiting cleanly", flush=True)
            break
        if os.path.exists(os.path.join(args.out, "STOP")):
            print("STOP file found — exiting cleanly", flush=True)
            break

    save_checkpoint(
        os.path.join(args.out, f"ckpt_{last_i:09d}.pkl"), params, opt_state, last_i
    )
    metrics["best_first_half_snr_db"] = round(float(best_snr), 3)
    # selection score of the saved artifact, under a key that names its
    # semantics (ADVICE r3: reusing best_artifact_first_half_snr_db for
    # a mean-over-windows score silently changed scale across runs)
    if n_win > 1:
        metrics["artifact_selection"] = "mean_window_first_half"
        metrics["best_artifact_mean_window_snr_db"] = round(
            float(best_artifact), 3
        )
    else:
        metrics["artifact_selection"] = "window0_first_half"
        metrics["best_artifact_first_half_snr_db"] = round(
            float(best_artifact), 3
        )
    if args.walk_eval_every and np.isfinite(best_walk):
        metrics["best_walk_refit_full_snr_db"] = round(float(best_walk), 3)
    if args.align_refine:
        metrics["best_aligned_first_half_snr_db"] = round(
            float(best_aligned), 3
        )
    write_metrics()
    commit_artifacts(
        [os.path.join(args.out, n) for n in ("ema_best.pkl", "walk_best.pkl")],
        force=True,
    )
    if metrics.get("aborted"):
        # no "done" sentinel: the babysitter should treat an abort as a
        # crash and relaunch with --resume (leg 3 ended silently because
        # ABORT still printed the completion sentinel)
        print(f"aborted: best first-half SNR {best_snr:.2f} dB", flush=True)
        sys.exit(3)
    print(f"done: best first-half SNR {best_snr:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
