"""Event-level anatomy of a SIAM checkpoint's holdout reconstruction.

Both cheap generalization hypotheses are measured negatives (step count:
BENCHMARKS.md "training-amount hypothesis — NEGATIVE"; corpus entropy:
"corpus-entropy hypothesis — ALSO NEGATIVE"): holdout waveform SNR pins
at ~0 dB while first-half LSD plateaus at ~25 dB. This probe asks the
question that decides where round 5 spends its chip-hours: **what are
the decoder's events actually doing on unseen audio?**

For each greedy event (reference loop `iterativedecomposition.py:321-371`;
ours `mptpu/models/siam.py make_iterative_fn`) it measures, against the
time-domain residual the event was meant to remove:

- ``rho0``      normalized correlation as placed (lag 0);
- ``rho_max``   best normalized correlation over ALL lags, and ``lag``;
- ``rho_chance`` the same event's best |correlation| against a DIFFERENT
  segment — the match an event of this length/spectrum gets by luck.

and four first-half SNRs that bracket what these event waveforms could
ever deliver:

- ``as_placed_snr_db``        trained gains, trained placement (== eval);
- ``oracle_gain_snr_db``      greedy optimal gain per event, lag 0
  (perfect gain re-fit — the decode-side ``refit_event_gains`` ceiling);
- ``oracle_align_snr_db``     optimal gain + lag within ±align (the
  ``align_refine`` decode ceiling);
- ``oracle_place_snr_db``     optimal gain + unrestricted lag (upper
  bound for these waveforms, any placement).

Reading: ``rho_max`` ≈ ``rho_chance`` → the waveforms carry no content
information (the encoder→decoder path is the lever). ``rho_max`` ≫
chance but ``oracle_gain`` ≪ ``oracle_place`` → waveforms are right but
misplaced (scheduler/placement is the lever). ``oracle_place`` itself
small → no placement or gain fix can work; the decoder must change.

CPU-only by design (never contends for the chip): run with
``JAX_PLATFORMS=cpu python scripts/holdout_anatomy.py``; the script
additionally forces the platform itself.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # probe must never take the TPU

import jax.numpy as jnp
import numpy as np


def parse_run_config(run_dir: str) -> dict:
    """Read the knob set from the run's recorded config line (the ADVICE-r3
    lesson: never default-guess a checkpoint's training config)."""
    with open(os.path.join(run_dir, "metrics.json")) as f:
        cfg = json.load(f)["config"]
    out = {}
    m = re.search(r"n_samples 2\^(\d+), (\d+) events", cfg)
    out["n_samples"] = 2 ** int(m.group(1))
    out["n_events"] = int(m.group(2))
    for key, pat in [
        ("attn_floor", r"attn_floor ([\d.eE+-]+)"),
        ("attn_leak", r"attn_leak ([\d.eE+-]+)"),
        ("switch_clamp", r"switch_clamp ([\d.eE+-]+)"),
        ("residual_clamp", r"residual_clamp ([\d.eE+-]+)"),
        ("selection_leak", r"selection_leak ([\d.eE+-]+)"),
        ("selection_floor", r"selection_floor ([\d.eE+-]+)"),
        ("switch_bias_init", r"switch_bias_init ([\d.eE+-]+)"),
    ]:
        mm = re.search(pat, cfg)
        out[key] = float(mm.group(1)) if mm else 0.0
    m = re.search(r"STFT (\d+)/(\d+)", cfg)
    out["window"], out["step"] = int(m.group(1)), int(m.group(2))
    out["fixed_noise"] = "fixed_noise True" in cfg
    out["spectral_skip"] = "spectral_skip True" in cfg
    out["spectral_filter"] = "spectral_filter True" in cfg
    out["config_line"] = cfg
    return out


def xcorr_all_lags(res: np.ndarray, w: np.ndarray) -> np.ndarray:
    """c[k] = sum_t res[t] * w[t - (k - N + 1)] for k in [0, 2N-2] via FFT."""
    n = res.shape[-1]
    size = 2 * n
    R = np.fft.rfft(res, size)
    W = np.fft.rfft(w, size)
    c = np.fft.irfft(R * np.conj(W), size)
    # lags -(n-1) .. (n-1): np c[k] corresponds to shift of w by +k (mod)
    return np.concatenate([c[size - (n - 1):], c[:n]])  # index lag+n-1


def snr_db(target: np.ndarray, residual: np.ndarray) -> float:
    return float(
        10.0
        * np.log10(
            np.sum(target**2) / max(float(np.sum(residual**2)), 1e-30)
        )
    )


def greedy_oracle(
    target: np.ndarray,
    events: np.ndarray,
    half: int,
    max_lag: int | None,
) -> float:
    """Sequentially remove each event at its optimal gain (and optimal lag
    within ±max_lag; None = lag fixed at 0), return first-half SNR."""
    res = target.copy()
    n = target.shape[-1]
    for w in events:
        e = float(np.sum(w**2))
        if e < 1e-20:
            continue
        if max_lag is None:
            g = float(np.sum(res * w)) / e
            res = res - g * w
            continue
        c = xcorr_all_lags(res, w)
        lags = np.arange(-(n - 1), n)
        keep = np.abs(lags) <= max_lag
        c_k = np.where(keep, c, 0.0)
        idx = int(np.argmax(np.abs(c_k)))
        lag = int(lags[idx])
        g = float(c[idx]) / e
        w_shift = np.roll(w, lag)
        if lag > 0:
            w_shift[:lag] = 0.0
        elif lag < 0:
            w_shift[lag:] = 0.0
        res = res - g * w_shift
    return snr_db(target[..., :half], res[..., :half])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="trained_weights/siam_quality_fresh")
    ap.add_argument("--align", type=int, default=256,
                    help="±lag budget of the align-refine decode level")
    ap.add_argument("--out", default=None,
                    help="output JSON (default <run>/anatomy.json)")
    args = ap.parse_args()

    cfg = parse_run_config(args.run)
    n_samples, n_events = cfg["n_samples"], cfg["n_events"]
    if n_samples == 2**15:
        hidden, context_dim = 64, 32
    elif n_samples == 2**17:
        hidden, context_dim = 128, 32
    else:
        hidden, context_dim = 32, 16

    from mptpu.sparse.quantize import set_selection_floor, set_selection_leak

    set_selection_leak(cfg["selection_leak"])
    set_selection_floor(cfg["selection_floor"])

    from mptpu.data import AudioIterator
    from mptpu.data.synthetic import ensure_demo_dataset
    from mptpu.models.siam import SIAMModel, make_iterative_fn
    from mptpu.train import CheckpointManager

    model = SIAMModel(
        n_samples=n_samples,
        context_dim=context_dim,
        in_channels=cfg["window"] // 2 + 1,
        hidden_channels=hidden,
        n_events=n_events,
        transform_window_size=cfg["window"],
        transform_step_size=cfg["step"],
        fft_resonance=True,
        attn_floor=cfg["attn_floor"],
        attn_leak=cfg["attn_leak"],
        switch_clamp=cfg["switch_clamp"],
        residual_clamp_scale=cfg["residual_clamp"],
        switch_bias_init=cfg["switch_bias_init"],
        spectral_skip=cfg["spectral_skip"],
        spectral_filter=cfg["spectral_filter"],
    )
    payload = CheckpointManager(args.run).latest()
    if payload is None:
        raise SystemExit(f"no checkpoint under {args.run}")
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    step = payload["step"]
    print(f"checkpoint step {step}", flush=True)

    # the exact eval holdout of scripts/siam_quality.py (seeds included)
    holdout_path = ensure_demo_dataset(
        "trained_weights/dense_corpus_holdout",
        n_files=2, seconds=24.0, dense=True, seed_offset=1000,
    )
    holdout = next(iter(AudioIterator(
        1, n_samples, normalize=True, seed=987654, audio_path=holdout_path,
    )))
    # a different segment from the same corpus — the chance baseline
    other = np.asarray(next(iter(AudioIterator(
        1, n_samples, normalize=True, seed=24680, audio_path=holdout_path,
    ))))[0, 0]

    iterative = make_iterative_fn(model)
    noise_key = jax.random.PRNGKey(42) if cfg["fixed_noise"] else jax.random.PRNGKey(7)
    channels, _, schedules, _ = jax.jit(iterative)(params, jnp.asarray(holdout), noise_key)
    channels = np.asarray(channels)[0]          # (E, N)
    target = np.asarray(holdout)[0, 0]          # (N,)
    half = n_samples // 2
    n = n_samples
    lags_axis = np.arange(-(n - 1), n)

    rows = []
    res = target.copy()
    for e in range(n_events):
        w = channels[e]
        energy = float(np.sum(w**2))
        row = {"event": e, "energy": energy}
        if energy > 1e-20:
            norm_w = np.sqrt(energy)
            norm_r = float(np.linalg.norm(res)) or 1e-30
            c = xcorr_all_lags(res, w)
            rho = c / (norm_w * norm_r)
            idx = int(np.argmax(np.abs(rho)))
            row["rho0"] = round(float(rho[n - 1]), 4)
            row["rho_max"] = round(float(np.abs(rho[idx])), 4)
            row["lag"] = int(lags_axis[idx])
            co = xcorr_all_lags(other, w)
            row["rho_chance"] = round(
                float(np.max(np.abs(co)) / (norm_w * (np.linalg.norm(other) or 1e-30))),
                4,
            )
        rows.append(row)
        res = res - w  # as-placed trained-gain greedy trajectory

    as_placed = snr_db(target[:half], res[:half])
    oracle_gain = greedy_oracle(target, channels, half, max_lag=None)
    oracle_align = greedy_oracle(target, channels, half, max_lag=args.align)
    oracle_place = greedy_oracle(target, channels, half, max_lag=n - 1)

    alive = [r for r in rows if "rho_max" in r]
    summary = {
        "run": args.run,
        "checkpoint_step": int(step),
        "config": cfg["config_line"],
        "n_alive_events": len(alive),
        "as_placed_snr_db": round(as_placed, 3),
        "oracle_gain_snr_db": round(oracle_gain, 3),
        "oracle_align_snr_db": round(oracle_align, 3),
        "oracle_place_snr_db": round(oracle_place, 3),
        "align_budget": args.align,
        "rho_max_mean": round(float(np.mean([r["rho_max"] for r in alive])), 4)
        if alive else None,
        "rho_chance_mean": round(
            float(np.mean([r["rho_chance"] for r in alive])), 4
        ) if alive else None,
        "events": rows,
    }
    out = args.out or os.path.join(args.run, "anatomy.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    for k in ("as_placed_snr_db", "oracle_gain_snr_db",
              "oracle_align_snr_db", "oracle_place_snr_db",
              "rho_max_mean", "rho_chance_mean", "n_alive_events"):
        print(k, summary[k], flush=True)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
