"""Train the audio operator on the infinite synthetic event corpus
(reference ``audiooperator.py:227-345``): each batch is freshly sampled
(start, duration, gamma envelope, latent) tuples; the model learns to
rasterize them; loss is energy removal on pooled envelopes.

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

from mptpu.models.audiooperator import (
    AudioOperator,
    band_pos_encode,
    envelope_loss,
    generate_training_batch,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--n-samples", type=int, default=2**15)
    p.add_argument("--n-bands", type=int, default=512)
    p.add_argument("--max-freq", type=float, default=2048.0)
    p.add_argument("--envelope-resolution", type=int, default=128)
    p.add_argument("--latent-dim", type=int, default=64)
    p.add_argument("--model-dim", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--pool-window", type=int, default=512)
    p.add_argument("--pool-step", type=int, default=128)
    p.add_argument("--overfit", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="trained_weights/audiooperator")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    faulthandler.dump_traceback_later(7200, exit=True)
    os.makedirs(args.out, exist_ok=True)

    if args.smoke:
        args.n_samples, args.n_bands, args.model_dim = 2**11, 16, 32
        args.envelope_resolution, args.latent_dim = 32, 8
        args.pool_window, args.pool_step = 128, 32

    n_events = 1
    pos_dim = args.n_bands * 2

    model = AudioOperator(
        envelope_resolution=args.envelope_resolution,
        latent_dim=args.latent_dim,
        pos_encoding_dim=pos_dim,
        model_dim=args.model_dim,
    )

    key = jax.random.PRNGKey(args.seed)

    times = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, args.n_samples).reshape(1, 1, -1),
        (args.batch_size, 1, args.n_samples),
    )
    times_enc = band_pos_encode(times, args.n_bands, max_freq=args.max_freq)

    def make_batch(key):
        kb, kl = jax.random.split(key)
        target, starts, durs, envs = generate_training_batch(
            kb, args.batch_size, args.n_samples, args.envelope_resolution
        )
        latents = jax.random.uniform(
            kl, (args.batch_size, n_events, args.latent_dim),
            minval=-1.0, maxval=1.0,
        )
        es = band_pos_encode(
            starts.reshape(-1, 1, 1), args.n_bands, max_freq=args.max_freq
        ).reshape(args.batch_size, n_events, pos_dim)
        ed = band_pos_encode(
            durs.reshape(-1, 1, 1), args.n_bands, max_freq=args.max_freq
        ).reshape(args.batch_size, n_events, pos_dim)
        return target, es, ed, envs[:, None, :], latents

    def loss_fn(params, batch):
        target, es, ed, envs, latents = batch
        recon = model.apply(params, es, ed, envs, latents, times_enc)
        return envelope_loss(
            target, recon, args.pool_window, args.pool_step
        )

    init_batch = make_batch(key)
    params = jax.jit(model.init)(key, *init_batch[1:], times_enc)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        batch = make_batch(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def overfit_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    t0 = time.perf_counter()
    for i in range(args.iterations):
        if args.overfit:
            params, opt_state, loss = overfit_step(params, opt_state, init_batch)
        else:
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, sub)
        if i % 25 == 0:
            l = float(loss)
            losses.append([i, round(l, 4)])
            print(f"iter {i} loss {l:.4f}", flush=True)

    elapsed = time.perf_counter() - t0
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(
            {"losses": losses,
             "steps_per_s": args.iterations / max(elapsed, 1e-9)},
            f, indent=1,
        )
    print(f"done in {elapsed:.1f}s", flush=True)


if __name__ == "__main__":
    main()
