"""Overfit the hierarchical textural model to one segment (reference
``textural.py:137-192``): STFT loss + confidence loss that sharpens the
soft binary time choices.

Run in the background to completion (never under ``timeout``)."""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mptpu.models.textural import TexturalModel, confidence_loss
from mptpu.ops.stft import stft
from mptpu.utils.wav import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--n-samples", type=int, default=2**16)
    p.add_argument("--n-events", type=int, default=64)
    p.add_argument("--n-atoms", type=int, default=64)
    p.add_argument("--atom-size", type=int, default=2048)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--confidence-weight", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="trained_weights/textural")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    faulthandler.dump_traceback_later(7200, exit=True)
    os.makedirs(args.out, exist_ok=True)
    if args.smoke:
        args.n_samples, args.n_events = 2**12, 8
        args.n_atoms, args.atom_size = 8, 128

    from mptpu.data.synthetic import synthetic_audio

    samplerate = 22050
    seg = synthetic_audio(
        args.n_samples, samplerate,
        n_events=max(4, int(args.n_samples / samplerate * 8)),
        seed=args.seed,
    )
    target = jnp.asarray(seg).reshape(1, 1, -1)
    write_wav(os.path.join(args.out, "target.wav"), seg, samplerate)

    model = TexturalModel(
        n_samples=args.n_samples, n_events=args.n_events,
        n_atoms=args.n_atoms, atom_size=args.atom_size,
        latent_dim=args.latent_dim,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    tspec = stft(target, 2048, 256, pad=True)

    def loss_fn(params):
        recon, logits = model.apply(params)
        rspec = stft(recon, 2048, 256, pad=True)
        return (
            jnp.sum(jnp.abs(rspec - tspec))
            + args.confidence_weight * confidence_loss(logits)
        ), recon

    @jax.jit
    def step(params, opt_state):
        (loss, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, recon

    losses = []
    t0 = time.perf_counter()
    recon = None
    for i in range(args.iterations):
        params, opt_state, loss, recon = step(params, opt_state)
        if i % 25 == 0:
            l = float(loss)
            losses.append([i, round(l, 2)])
            print(f"iter {i} loss {l:.2f}", flush=True)

    elapsed = time.perf_counter() - t0
    if recon is not None:
        peak = float(jnp.abs(recon).max()) + 1e-9
        write_wav(
            os.path.join(args.out, "recon.wav"),
            np.asarray(recon[0, 0]) / peak, samplerate,
        )
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(
            {"losses": losses,
             "steps_per_s": args.iterations / max(elapsed, 1e-9)},
            f, indent=1,
        )
    print(f"done in {elapsed:.1f}s", flush=True)


if __name__ == "__main__":
    main()
