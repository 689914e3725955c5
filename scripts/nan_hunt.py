"""Root-cause the SIAM NaN gradients (VERDICT r2 item 3).

The dense-corpus quality run produced non-finite gradients on ~7% of
steps (finite-grad gate skipped them; reference's loss-only guard at
``iterativedecomposition.py:535-540`` would have missed them). This
script replays batches through the trained checkpoint at FIXED params
(the NaN is a property of (params, batch, key), not of the optimizer),
captures a reproducing (batch, key), and localizes the blowup:

  phase 1: scan N batches, record loss + grad-norm finiteness;
  phase 2: on the first bad batch — per-leaf non-finite grad counts and
           forward-intermediate finiteness (channels/vecs/schedules).

Run in the background to completion (never under `timeout` — killing a
TPU process wedges the device).
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
import optax

from mptpu.data import AudioIterator
from mptpu.losses import iterative_loss
from mptpu.models.siam import SIAMModel, make_iterative_fn, siam_transform
from mptpu.train.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str,
                   default="trained_weights/siam_quality_dense2/ckpt_000008125.pkl")
    p.add_argument("--batches", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--out", type=str, default="trained_weights/nan_hunt")
    p.add_argument("--watchdog-s", type=int, default=7200)
    p.add_argument("--guarded", action="store_true",
                   help="enable switch_clamp=100 + residual_clamp_scale=4 "
                        "(the round-3 fix) — same checkpoint, same corpus, "
                        "to demonstrate the non-finite rate drops to ~0")
    args = p.parse_args()

    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)
    os.makedirs(args.out, exist_ok=True)

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
        attn_floor=0.01,
        attn_leak=0.1,
        switch_clamp=100.0 if args.guarded else 0.0,
        residual_clamp_scale=4.0 if args.guarded else 0.0,
    )
    payload = load_checkpoint(args.ckpt)
    assert payload is not None, f"cannot load {args.ckpt}"
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    print(f"loaded {args.ckpt} (step {payload['step']})", flush=True)

    iterative = make_iterative_fn(model)
    fade = jnp.ones((1, 1, n_samples)).at[..., n_samples // 2 :].set(
        jnp.linspace(1.0, 0.0, n_samples // 2) ** 8
    )

    def loss_fn(params, target, key):
        channels, vecs, schedules, _ = iterative(params, target, key)
        loss = iterative_loss(
            target * fade,
            channels,
            lambda x: siam_transform(x, window, step_sz, mag_epsilon=1e-6),
        )
        return loss, (channels, vecs, schedules)

    @jax.jit
    def probe(params, target, key):
        (loss, (channels, vecs, schedules)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, target, key)
        gnorm = optax.global_norm(grads)
        bad = jax.tree_util.tree_map(
            lambda g: jnp.sum(~jnp.isfinite(g)), grads
        )
        fwd = {
            "channels_bad": jnp.sum(~jnp.isfinite(channels)),
            "vecs_bad": jnp.sum(~jnp.isfinite(vecs)),
            "schedules_bad": jnp.sum(~jnp.isfinite(schedules)),
            "channels_absmax": jnp.max(jnp.abs(channels)),
            "vecs_absmax": jnp.max(jnp.abs(vecs)),
            "schedules_max": jnp.max(schedules),
        }
        return loss, gnorm, bad, fwd

    from mptpu.data.synthetic import ensure_demo_dataset

    audio_path = ensure_demo_dataset(
        "trained_weights/dense_corpus", n_files=6, seconds=24.0, dense=True
    )
    stream = iter(AudioIterator(
        batch_size=args.batch_size, n_samples=n_samples, samplerate=22050,
        normalize=True, seed=1, audio_path=audio_path,
    ))
    key = jax.random.PRNGKey(0)

    n_bad = 0
    for i in range(args.batches):
        item = next(stream)
        k = jax.random.fold_in(key, i)
        loss, gnorm, bad, fwd = probe(params, item, k)
        loss, gnorm = float(loss), float(gnorm)
        finite = np.isfinite(loss) and np.isfinite(gnorm)
        if i % 10 == 0 or not finite:
            print(f"batch {i}: loss {loss:.1f} gnorm {gnorm:.3g} "
                  f"finite={finite}", flush=True)
        if not finite:
            n_bad += 1
            # localize: which param leaves, which forward tensors
            flat = jax.tree_util.tree_leaves_with_path(bad)
            bad_leaves = {
                jax.tree_util.keystr(kp): int(v)
                for kp, v in flat if int(v) > 0
            }
            fwd_stats = {k2: float(v) for k2, v in fwd.items()}
            print("  bad grad leaves:", json.dumps(bad_leaves, indent=1),
                  flush=True)
            print("  forward stats:", json.dumps(fwd_stats), flush=True)
            if n_bad == 1 and not args.guarded:
                np.savez(
                    os.path.join(args.out, "bad_batch.npz"),
                    batch=np.asarray(item),
                    key_fold=i,
                    loss=loss,
                    gnorm=gnorm,
                )
                with open(os.path.join(args.out, "diagnosis.json"), "w") as f:
                    json.dump({
                        "batch_index": i,
                        "loss": loss,
                        "gnorm": gnorm,
                        "bad_grad_leaves": bad_leaves,
                        "forward_stats": fwd_stats,
                    }, f, indent=1)
            if n_bad >= 3:
                break
    print(f"done: {n_bad} non-finite batches out of {i+1}", flush=True)


if __name__ == "__main__":
    main()
