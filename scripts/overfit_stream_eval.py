"""Streaming-walk eval of an overfit checkpoint (VERDICT r2 Missing #2):
the encoder's in-window mask confines single-window events to the first
half BY DESIGN — full-segment coverage is delivered by the half-overlap
streaming window walk (reference ``iterativedecomposition.py:275-319``).
This scores that walk: encode the overfit target through
``streaming_encode`` (padded with one window of silence so the walk's
windows tile past the segment end) and report FULL-segment SNR/LSD
beside the single-window numbers.

Run in the background to completion (never under ``timeout``).
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env, enable_compilation_cache
apply_platform_from_env()
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.models.siam import SIAMModel, make_streaming_fn, siam_transform
from mptpu.train.checkpoint import load_checkpoint
from mptpu.utils.wav import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", type=str, default="trained_weights/siam_overfit4")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--selection-leak", type=float, default=0.02)
    p.add_argument("--selection-floor", type=float, default=0.0)
    p.add_argument("--attn-floor", type=float, default=0.01)
    p.add_argument("--attn-leak", type=float, default=0.1)
    p.add_argument("--switch-clamp", type=float, default=20.0)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--n-samples-log2", type=int, default=17)
    p.add_argument("--n-events", type=int, default=32)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--context-dim", type=int, default=32)
    p.add_argument("--audio-events", type=int, default=0,
                   help="match the trainer's synthetic density override")
    p.add_argument("--stream-windows", type=int, default=1,
                   help="match the trainer's --stream-windows: rebuild "
                        "the same longer segment and walk all of it")
    p.add_argument("--gain-refit", type=float, default=0.0,
                   help="also score the walk with OMP per-(window,event) "
                        "amplitude re-projection at this ridge "
                        "(models/siam.py refit_event_gains; 0 = skip)")
    p.add_argument("--align-refine", type=int, default=0,
                   help="with --gain-refit, additionally shift-align "
                        "every (window,event) track within this many "
                        "samples (refine_event_alignment; 0 = gains "
                        "only)")
    p.add_argument("--pristine-windows", action="store_true",
                   help="ALSO score the walk with every window encoded "
                        "from the original spectrogram instead of the "
                        "running residual (--stream-windows checkpoints "
                        "train each position on pristine input, so the "
                        "residual handoff is out-of-distribution)")
    p.add_argument("--watchdog-s", type=int, default=3600)
    args = p.parse_args()

    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)

    if args.selection_leak or args.selection_floor:
        from mptpu.sparse.quantize import set_selection_leak, set_selection_floor
        set_selection_leak(args.selection_leak)
        set_selection_floor(args.selection_floor)

    n_samples = 2 ** args.n_samples_log2
    n_events, hidden, context_dim = args.n_events, args.hidden, args.context_dim
    window, step_sz = 2048, 256
    # round-5 conditioning flags from the run's recorded config (extra
    # params + different encode semantics when trained with them)
    spectral_skip = spectral_filter = False
    _cfg_path = os.path.join(args.run, "metrics.json")
    if os.path.exists(_cfg_path):
        try:
            with open(_cfg_path) as f:
                _cfg = json.load(f).get("config", "")
            spectral_skip = "spectral_skip True" in _cfg
            spectral_filter = "spectral_filter True" in _cfg
        except (IOError, ValueError):
            pass
    model = SIAMModel(
        n_samples=n_samples, context_dim=context_dim,
        in_channels=window // 2 + 1, hidden_channels=hidden,
        n_events=n_events, transform_window_size=window,
        transform_step_size=step_sz, fft_resonance=True,
        attn_floor=args.attn_floor, attn_leak=args.attn_leak,
        switch_clamp=args.switch_clamp, residual_clamp_scale=4.0,
        encoder_clamp=1e4,
        spectral_skip=spectral_skip, spectral_filter=spectral_filter,
    )

    from mptpu.data.synthetic import synthetic_audio
    half = n_samples // 2
    n_win = max(1, args.stream_windows)
    total_len = n_samples + (n_win - 1) * half
    base_events = args.audio_events or int(n_samples / 22050 * 8)
    seg = synthetic_audio(total_len, 22050,
                          n_events=int(round(
                              base_events * total_len / n_samples)),
                          seed=args.seed, sustained=True)
    target = jnp.asarray(seg).reshape(1, 1, total_len)
    # training parity (scripts/siam_overfit.py): the trainer fades each
    # window's second half; in the union of the walk's windows only the
    # FINAL half-window is always faded — score against what the model
    # was actually trained to reconstruct
    fade = jnp.ones((1, 1, total_len)).at[..., total_len - half:].set(
        jnp.linspace(1.0, 0.0, half) ** 8)
    target = target * fade
    # one extra window of silence so the half-overlap walk tiles windows
    # past the segment end, covering the real segment end to end
    padded = jnp.pad(target, ((0, 0), (0, 0), (0, n_samples)))

    ckpt_path = args.ckpt
    if ckpt_path is None:
        # prefer the EMA-best snapshot: the last ckpt_* can postdate a
        # late-run divergence storm (run sw3's final checkpoint scored
        # 5 dB below its EMA best)
        ema = os.path.join(args.run, "ema_best.pkl")
        if os.path.exists(ema):
            ckpt_path = ema
        else:
            cands = sorted(
                f for f in os.listdir(args.run)
                if f.startswith("ckpt_") and f.endswith(".pkl")
            )
            if not cands:
                sys.exit(f"no checkpoint (.pkl) in {args.run} — the run "
                         "dir may hold only whitelisted artifacts "
                         "(wav/json); pass --ckpt explicitly")
            ckpt_path = os.path.join(args.run, cands[-1])
    payload = load_checkpoint(ckpt_path)
    if payload is None:
        sys.exit(f"no loadable checkpoint at {ckpt_path} — the run "
                 "dir may hold only whitelisted artifacts (wav/json);"
                 " pass --ckpt explicitly")
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    print(f"loaded {ckpt_path} (step {payload['step']})", flush=True)

    stream = make_streaming_fn(model)
    # the checkpoint trained with --fixed-noise: every decode must use
    # the same key the decoder memorized
    kw = dict(fixed_noise=True)
    padded_tgt = jnp.pad(target, ((0, 0), (0, 0), (0, n_samples)))
    # DEFAULT walk (time-domain residual handoff, models/siam.py): the
    # deployment decode — no sidestep flags
    recon_full = stream(
        params, padded, jax.random.PRNGKey(42), **kw
    )[..., :total_len]
    _ = float(recon_full.sum())  # force transfer (axon under-reports)
    # the reference-literal spec-domain residual write-back, for the
    # record beside it
    recon_spec = stream(
        params, padded, jax.random.PRNGKey(42), mode="spec", **kw
    )[..., :total_len]
    _ = float(recon_spec.sum())
    recon_refit = None
    if args.gain_refit:
        recon_refit = stream(
            params, padded, jax.random.PRNGKey(42), **kw,
            refit_gains_against=padded_tgt,
            refit_ridge=args.gain_refit,
            align_refine=args.align_refine,
        )[..., :total_len]
        _ = float(recon_refit.sum())
    recon_pristine = None
    if args.pristine_windows:
        recon_pristine = stream(
            params, padded, jax.random.PRNGKey(42), **kw,
            refit_gains_against=padded_tgt if args.gain_refit else None,
            refit_ridge=args.gain_refit or 1e-3,
            align_refine=args.align_refine,
            pristine_windows=True,
        )[..., :total_len]
        _ = float(recon_pristine.sum())

    def snr(t, r):
        return float(10 * jnp.log10(
            jnp.maximum(jnp.sum(t**2), 1e-12)
            / jnp.maximum(jnp.sum((t - r) ** 2), 1e-12)))

    def lsd(t, r):
        ts = siam_transform(t, window, step_sz)
        rs = siam_transform(r, window, step_sz)
        return float(jnp.sqrt(jnp.mean(
            (20 * jnp.log10(ts + 1e-8) - 20 * jnp.log10(rs + 1e-8)) ** 2)))

    from mptpu.perceptual import pif_distance

    _pif = jax.jit(pif_distance)

    def pif(t, r):
        # phase-invariant perceptual distance (lower is better; ~1.0 =
        # silence) — arbitrates waveform-vs-LSD disagreements like the
        # r3 refit anomaly (refit improved SNR, degraded LSD)
        return float(_pif(t, r))

    out = {
        "ckpt": ckpt_path,
        "stream_windows": n_win,
        "total_len": int(total_len),
        # streaming_* = the DEFAULT walk (round 4+: time-domain
        # residual handoff; r3 files recorded the spec-domain walk
        # under these keys — see default_mode)
        "default_mode": "handoff",
        "streaming_full_snr_db": round(snr(target, recon_full), 3),
        "streaming_full_lsd_db": round(lsd(target, recon_full), 3),
        "streaming_first_half_snr_db": round(
            snr(target[..., :half], recon_full[..., :half]), 3),
        "streaming_second_half_snr_db": round(
            snr(target[..., half:], recon_full[..., half:]), 3),
        "streaming_full_pif_dist": round(pif(target, recon_full), 4),
        # reference-literal spec-domain residual write-back
        "spec_full_snr_db": round(snr(target, recon_spec), 3),
        "spec_first_half_snr_db": round(
            snr(target[..., :half], recon_spec[..., :half]), 3),
    }
    if recon_refit is not None:
        out["refit_ridge"] = args.gain_refit
        out["align_refine"] = args.align_refine
        out["refit_full_snr_db"] = round(snr(target, recon_refit), 3)
        out["refit_full_lsd_db"] = round(lsd(target, recon_refit), 3)
        out["refit_full_pif_dist"] = round(pif(target, recon_refit), 4)
        out["refit_first_half_snr_db"] = round(
            snr(target[..., :half], recon_refit[..., :half]), 3)
        out["refit_second_half_snr_db"] = round(
            snr(target[..., half:], recon_refit[..., half:]), 3)
    if recon_pristine is not None:
        out["pristine_full_snr_db"] = round(snr(target, recon_pristine), 3)
        out["pristine_full_lsd_db"] = round(lsd(target, recon_pristine), 3)
        out["pristine_full_pif_dist"] = round(
            pif(target, recon_pristine), 4)
        out["pristine_first_half_snr_db"] = round(
            snr(target[..., :half], recon_pristine[..., :half]), 3)
        out["pristine_second_half_snr_db"] = round(
            snr(target[..., half:], recon_pristine[..., half:]), 3)
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(args.run, "stream_eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    write_wav(os.path.join(args.run, "recon_streaming.wav"),
              np.asarray(recon_full[0, 0]), 22050)
    if recon_refit is not None:
        write_wav(os.path.join(args.run, "recon_streaming_refit.wav"),
                  np.asarray(recon_refit[0, 0]), 22050)
    if recon_pristine is not None:
        write_wav(os.path.join(args.run, "recon_streaming_pristine.wav"),
                  np.asarray(recon_pristine[0, 0]), 22050)


if __name__ == "__main__":
    main()
