"""NaN hunt phase 4: the full-config overfit NaN storm (run sw3,
iters ~8650-8750 — finite loss, INFINITE gradients, persisting at
lr_mult 2e-6, i.e. a backward-path landmine at an essentially frozen
parameter point, key-dependent).

Replays the exact trainer loss (scripts/siam_overfit.py:328-345) at the
rolled-back checkpoint with the exact step keys the storm used, then
decomposes the gradient by loss term to locate the blowing component.

Run in the background to completion (never under ``timeout``).
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

from mptpu.models.siam import (
    SIAMModel, make_iterative_fn, siam_transform, refit_event_gains,
)
from mptpu.losses import iterative_loss
from mptpu.train.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str,
                   default="trained_weights/siam_overfit_full_sw3/"
                           "ckpt_000008750.pkl",
                   help="checkpoint GC keeps only the last 3 numbered "
                        "snapshots; 8750 is the closest surviving state "
                        "to the 8650-8747 storm (post-rollback params a "
                        "few 2e-6-lr steps past the 8700 snapshot)")
    p.add_argument("--iters", type=str,
                   default="8735,8738,8741,8744,8747,8750")
    p.add_argument("--perturb-until", type=int, default=8753,
                   help="trainer state at the storm tail: rollback #20 "
                        "at iter 8723 perturbed step keys for 30 steps "
                        "(fold_in(PRNGKey(0), i) below this iter, the "
                        "fixed PRNGKey(42) at or above it)")
    p.add_argument("--watchdog-s", type=int, default=5400)
    args = p.parse_args()
    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)

    from mptpu.sparse.quantize import set_selection_leak, set_selection_floor
    set_selection_leak(0.02)
    set_selection_floor(0.02)

    # exact run-sw3 geometry (scripts/siam_overfit.py defaults + its
    # command line: --audio-events 12 --stream-windows 3 --seed 3
    # --waveform-weight 2000 --gain-refit 0.001)
    n_samples, n_events, hidden, context_dim = 2**17, 32, 128, 32
    window, step_sz = 2048, 256
    half = n_samples // 2
    n_win = 3
    model = SIAMModel(
        n_samples=n_samples, context_dim=context_dim,
        in_channels=window // 2 + 1, hidden_channels=hidden,
        n_events=n_events, transform_window_size=window,
        transform_step_size=step_sz, fft_resonance=True,
        attn_floor=0.01, attn_leak=0.1, switch_clamp=20.0,
        residual_clamp_scale=4.0, encoder_clamp=1e4,
        switch_bias_init=1.0,
    )

    from mptpu.data.synthetic import synthetic_audio
    from mptpu.data import streaming_windows
    total_len = n_samples + (n_win - 1) * half
    seg = synthetic_audio(
        total_len, 22050,
        n_events=int(round(12 * total_len / n_samples)),
        seed=3, sustained=True)
    targets = jnp.asarray(
        streaming_windows(seg, n_samples, n_win)
    ).reshape(n_win, 1, 1, n_samples)
    fade = jnp.ones((1, 1, n_samples)).at[..., half:].set(
        jnp.linspace(1.0, 0.0, half) ** 8)
    faded = targets * fade
    tgt_e = jnp.sum(targets[..., :half] ** 2, axis=(-1, -2, -3))

    payload = load_checkpoint(args.ckpt)
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    print(f"loaded {args.ckpt} (step {payload['step']})", flush=True)

    iterative = make_iterative_fn(model)
    WAVE_W, RIDGE = 2000.0, 0.001

    def parts(params, key, f_tgt, tgt, tgt_e_half):
        channels, vecs, schedules, _ = iterative(params, f_tgt, key)
        mag = iterative_loss(
            f_tgt, channels,
            lambda x: siam_transform(x, window, step_sz, mag_epsilon=1e-6))
        gains = refit_event_gains(tgt, channels, ridge=RIDGE, span=half)
        gains = jnp.clip(gains, -10.0, 10.0)
        recon = jnp.einsum("be,ben->bn", gains, channels)[:, None]
        wave = jnp.sum(
            (recon[..., :half] - tgt[..., :half]) ** 2
        ) / jnp.maximum(tgt_e_half, 1e-12)
        raw = jnp.sum(channels, axis=1, keepdims=True)
        wave_raw = jnp.sum(
            (raw[..., :half] - tgt[..., :half]) ** 2
        ) / jnp.maximum(tgt_e_half, 1e-12)
        return mag, wave, wave_raw

    def make_grad(term):
        def lf(params, key, f_tgt, tgt, tgt_e_half):
            mag, wave, wave_raw = parts(params, key, f_tgt, tgt, tgt_e_half)
            return {
                "full": mag + WAVE_W * wave,
                "mag": mag,
                "wave_refit": WAVE_W * wave,
                "wave_raw": WAVE_W * wave_raw,
            }[term]
        return jax.jit(jax.value_and_grad(lf))

    grads = {t: make_grad(t) for t in
             ("full", "mag", "wave_refit", "wave_raw")}

    def gnorm_tree(g):
        leaves = {}
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        for path, leaf in flat:
            name = "/".join(str(k) for k in path)
            leaves[name] = float(jnp.sqrt(jnp.sum(leaf.astype(
                jnp.float64) ** 2)))
        return leaves

    iters = [int(x) for x in args.iters.split(",")]
    report = []
    for i in iters:
        key = (jax.random.fold_in(jax.random.PRNGKey(0), i)
               if i < args.perturb_until else jax.random.PRNGKey(42))
        w = i % n_win
        row = {"iter": i, "window": w,
               "key": "perturbed" if i < args.perturb_until else "fixed42"}
        loss, g = grads["full"](params, key, faded[w], targets[w], tgt_e[w])
        flat = jnp.concatenate([jnp.ravel(x) for x in
                                jax.tree_util.tree_leaves(g)])
        finite = bool(jnp.all(jnp.isfinite(flat)))
        row["loss"] = float(loss)
        row["grad_finite"] = finite
        row["gnorm"] = float(jnp.sqrt(jnp.sum(
            jnp.where(jnp.isfinite(flat), flat, 0.0) ** 2)))
        row["n_nonfinite"] = int(jnp.sum(~jnp.isfinite(flat)))
        print(json.dumps(row), flush=True)
        if not finite:
            # decompose by loss term
            for term in ("mag", "wave_refit", "wave_raw"):
                l2, g2 = grads[term](params, key, faded[w], targets[w],
                                     tgt_e[w])
                f2 = jnp.concatenate([jnp.ravel(x) for x in
                                      jax.tree_util.tree_leaves(g2)])
                fin2 = bool(jnp.all(jnp.isfinite(f2)))
                row[term] = {"loss": float(l2), "finite": fin2}
                print(f"  {term}: loss {float(l2):.4f} finite {fin2}",
                      flush=True)
                if not fin2:
                    tree = gnorm_tree(g2)
                    worst = sorted(tree.items(),
                                   key=lambda kv: -(np.inf if not
                                                    np.isfinite(kv[1])
                                                    else kv[1]))[:8]
                    row[term]["worst_leaves"] = worst
                    for n, v in worst:
                        print(f"    {n}: {v}", flush=True)
        report.append(row)
    out_dir = os.path.dirname(args.ckpt)
    with open(os.path.join(out_dir, "nan_hunt4.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote nan_hunt4.json", flush=True)


if __name__ == "__main__":
    main()
