"""Score an overfit checkpoint with the encode-time refinement passes:
raw greedy decode vs OMP gain re-fit (``refit_event_gains``) vs
shift+gain alignment refinement (``refine_event_alignment``), all on the
single-window first-half eval the trainer reports.

Runs fine on CPU (one forward; set ``JAX_PLATFORMS=cpu``) — used to
quantify the refinement headroom of an existing checkpoint without
burning chip time. Mirrors the eval in ``scripts/siam_overfit.py``.
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

from mptpu.models.siam import (
    SIAMModel,
    make_iterative_fn,
    siam_transform,
    refit_event_gains,
    refine_event_alignment,
)
from mptpu.train.checkpoint import load_checkpoint
from mptpu.utils.wav import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", type=str, default="trained_weights/siam_overfit5")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--attn-floor", type=float, default=0.01)
    p.add_argument("--attn-leak", type=float, default=0.1)
    p.add_argument("--selection-leak", type=float, default=0.02)
    p.add_argument("--selection-floor", type=float, default=0.02)
    p.add_argument("--switch-clamp", type=float, default=20.0)
    p.add_argument("--noise-seed", type=int, default=42,
                   help="the trainer's --fixed-noise key")
    p.add_argument("--gain-refit", type=float, default=1e-3)
    p.add_argument("--align-refine", type=int, default=256)
    p.add_argument("--align-iters", type=int, default=3)
    p.add_argument("--watchdog-s", type=int, default=5400)
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
        encoder_clamp=1e4,
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
    key = jax.random.PRNGKey(args.noise_seed)

    t0 = time.perf_counter()
    channels, _, schedules, _ = jax.jit(iterative)(params, faded_target, key)
    channels = jax.block_until_ready(channels)
    print(f"forward {time.perf_counter() - t0:.1f}s "
          f"(platform {jax.devices()[0].platform})", flush=True)

    def snr(t, r):
        return round(float(10 * jnp.log10(
            jnp.maximum(jnp.sum(t**2), 1e-12)
            / jnp.maximum(jnp.sum((t - r) ** 2), 1e-12))), 3)

    def lsd(t, r):
        ts = siam_transform(t, window, step_sz)
        rs = siam_transform(r, window, step_sz)
        return round(float(jnp.sqrt(jnp.mean(
            (20 * jnp.log10(ts + 1e-8) - 20 * jnp.log10(rs + 1e-8)) ** 2))), 3)

    raw = jnp.sum(channels, axis=1, keepdims=True)
    gains = jnp.clip(
        refit_event_gains(target, channels, ridge=args.gain_refit, span=half),
        -10.0, 10.0,
    )
    refit = jnp.einsum("be,ben->bn", gains, channels)[:, None]
    refined_ch, shifts, a_gains = refine_event_alignment(
        target, channels, max_shift=args.align_refine,
        n_iters=args.align_iters, ridge=args.gain_refit, span=half,
    )
    aligned = jnp.einsum("be,ben->bn", a_gains, refined_ch)[:, None]

    t_h = target[..., :half]
    out = {
        "ckpt": ckpt_path,
        "step": payload["step"],
        "raw_first_half_snr_db": snr(t_h, raw[..., :half]),
        "raw_first_half_lsd_db": lsd(t_h, raw[..., :half]),
        "refit_first_half_snr_db": snr(t_h, refit[..., :half]),
        "refit_first_half_lsd_db": lsd(t_h, refit[..., :half]),
        "aligned_first_half_snr_db": snr(t_h, aligned[..., :half]),
        "aligned_first_half_lsd_db": lsd(t_h, aligned[..., :half]),
        "gain_refit_ridge": args.gain_refit,
        "align_max_shift": args.align_refine,
        "align_iters": args.align_iters,
        "refit_gains": [round(float(g), 4) for g in np.asarray(gains)[0]],
        "align_shifts": [int(s) for s in np.asarray(shifts)[0]],
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(args.run, "refine_eval.json"), "w") as f:
        json.dump(out, f, indent=1)
    # same filename the trainer's best-aligned eval writes, so the
    # report page (scripts/report.py make_overfit_report) picks it up
    write_wav(os.path.join(args.run, "recon_aligned_best.wav"),
              np.asarray(aligned[0, 0]), 22050)


if __name__ == "__main__":
    main()
