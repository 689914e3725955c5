"""Decompose the overfit run's residual error: phase vs magnitude vs
coverage (diagnosis for the r3 SNR plateau; reference overfit mode
``iterativedecomposition.py:612-647`` never reports waveform SNR at all,
so this is the instrument the plateau question needs).

Loads a checkpoint from an overfit run directory, reproduces the eval
reconstruction, and reports:

- waveform SNR (must match the run's logged eval)
- SNR after an optimal global gain (is amplitude calibration the gap?)
- magnitude-spectrogram SNR (phase-blind: if this is high while wave SNR
  is low, the residual is phase error and the mag loss is done helping)
- per-event channel energies (how many events are actually alive)
- error energy by time quartile of the covered half (coverage gaps?)

Single forward on whatever device is default; run in background, never
under ``timeout`` (TPU wedge rule).
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.models.siam import SIAMModel, make_iterative_fn, siam_transform
from mptpu.train.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", type=str, default="trained_weights/siam_overfit4")
    p.add_argument("--ckpt", type=str, default=None,
                   help="explicit checkpoint path; default = newest in --run")
    p.add_argument("--selection-leak", type=float, default=0.02)
    p.add_argument("--selection-floor", type=float, default=0.0)
    p.add_argument("--attn-floor", type=float, default=0.01)
    p.add_argument("--attn-leak", type=float, default=0.1)
    p.add_argument("--switch-clamp", type=float, default=20.0)
    p.add_argument("--switch-bias-init", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--watchdog-s", type=int, default=3600)
    args = p.parse_args()

    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)

    if args.selection_leak or args.selection_floor:
        from mptpu.sparse.quantize import set_selection_leak, set_selection_floor
        set_selection_leak(args.selection_leak)
        set_selection_floor(args.selection_floor)

    n_samples, n_events, hidden, context_dim = 2**17, 32, 128, 32
    window, step_sz = 2048, 256
    model = SIAMModel(
        n_samples=n_samples, context_dim=context_dim,
        in_channels=window // 2 + 1, hidden_channels=hidden,
        n_events=n_events, transform_window_size=window,
        transform_step_size=step_sz, fft_resonance=True,
        attn_floor=args.attn_floor, attn_leak=args.attn_leak,
        switch_clamp=args.switch_clamp, residual_clamp_scale=4.0,
        encoder_clamp=1e4, switch_bias_init=args.switch_bias_init,
    )

    from mptpu.data.synthetic import synthetic_audio
    seg = synthetic_audio(n_samples, 22050,
                          n_events=int(n_samples / 22050 * 8),
                          seed=args.seed, sustained=True)
    target = jnp.asarray(seg).reshape(1, 1, n_samples)
    fade = jnp.ones((1, 1, n_samples)).at[..., n_samples // 2:].set(
        jnp.linspace(1.0, 0.0, n_samples // 2) ** 8)
    faded_target = target * fade
    half = n_samples // 2

    ckpt_path = args.ckpt
    if ckpt_path is None:
        cands = sorted(
            f for f in os.listdir(args.run)
            if f.startswith("ckpt_") and f.endswith(".pkl")
        )
        ckpt_path = os.path.join(args.run, cands[-1])
    payload = load_checkpoint(ckpt_path)
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    print(f"loaded {ckpt_path} (step {payload['step']})", flush=True)

    iterative = make_iterative_fn(model)
    noise_key = jax.random.PRNGKey(42)

    channels, vecs, schedules, _ = jax.jit(iterative)(
        params, faded_target, noise_key)
    recon = jnp.sum(channels, axis=1, keepdims=True)
    # force full materialisation (axon under-reports via block_until_ready)
    _ = float(recon.sum())

    t_h = target[..., :half]
    r_h = recon[..., :half]

    def snr(t, r):
        return float(10 * jnp.log10(
            jnp.maximum(jnp.sum(t**2), 1e-12)
            / jnp.maximum(jnp.sum((t - r) ** 2), 1e-12)))

    wave_snr = snr(t_h, r_h)
    g = float(jnp.sum(t_h * r_h) / jnp.maximum(jnp.sum(r_h**2), 1e-12))
    gain_snr = snr(t_h, g * r_h)

    # phase-blind spectral SNR on the run's own transform
    ts = siam_transform(t_h, window, step_sz)
    rs = siam_transform(r_h, window, step_sz)
    mag_snr = float(10 * jnp.log10(
        jnp.sum(ts**2) / jnp.maximum(jnp.sum((ts - rs) ** 2), 1e-12)))

    # per-event energy (alive events) on the first half
    ch_h = channels[..., :half]
    ev_energy = np.asarray(jnp.sum(ch_h[0] ** 2, axis=-1))
    alive = int(np.sum(ev_energy > 1e-6 * float(jnp.sum(t_h**2))))

    # error energy by time quartile of the covered half
    err = np.asarray((t_h - r_h)[0, 0] ** 2)
    tgt = np.asarray(t_h[0, 0] ** 2)
    q = half // 4
    quartiles = [
        dict(err=float(err[i * q:(i + 1) * q].sum()),
             tgt=float(tgt[i * q:(i + 1) * q].sum()))
        for i in range(4)
    ]

    out = {
        "ckpt": ckpt_path,
        "wave_snr_db": round(wave_snr, 3),
        "optimal_gain": round(g, 4),
        "gain_adjusted_snr_db": round(gain_snr, 3),
        "mag_spec_snr_db": round(mag_snr, 3),
        "sched_max": round(float(jnp.max(schedules)), 4),
        "alive_events": alive,
        "event_energy_top8": [round(float(x), 4) for x in
                              np.sort(ev_energy)[::-1][:8]],
        "event_energy_bottom8": [round(float(x), 6) for x in
                                 np.sort(ev_energy)[:8]],
        "target_energy_half": round(float(jnp.sum(t_h**2)), 3),
        "err_by_quartile": quartiles,
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(args.run, "diag.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
