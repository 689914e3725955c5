"""Audio splatting overfit + article generation (reference
``hierarchical.py`` — BASELINE config #3: 64 events, 3000 iterations,
multi-res STFT loss).

Usage:
  python scripts/splat.py [--iterations 3000] [--n-events 64]
      [--n-samples 65536] [--article out.html] [--tiny]
"""

from __future__ import annotations

import argparse
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

from mptpu.data import get_one_audio_segment
from mptpu.losses import iterative_loss
from mptpu.models import OverfitHierarchicalEvents, splat_loss_transform
from mptpu.obs import conjure_article, AudioComponent, ImageComponent
from mptpu.ops import max_norm, stft


def overfit_splat(
    n_samples: int = 2**16,
    samplerate: int = 22050,
    n_events: int = 64,
    event_dim: int = 16,
    n_iterations: int = 3000,
    lr: float = 1e-3,
    article_path: str | None = None,
    audio_path: str | None = None,
    use_iterative_loss: bool = False,
):
    target = get_one_audio_segment(
        n_samples, samplerate, audio_path=audio_path
    ).reshape(1, 1, n_samples)

    model = OverfitHierarchicalEvents(
        n_samples=n_samples,
        samplerate=samplerate,
        n_events=n_events,
        context_dim=event_dim,
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key, key)

    def loss_fn(params, key):
        recon, vectors, times = model.apply(params, key)
        if use_iterative_loss:
            return iterative_loss(target, recon, splat_loss_transform)
        summed = jnp.sum(recon, axis=1, keepdims=True)
        t = splat_loss_transform(target)
        r = splat_loss_transform(summed)
        return jnp.sum(jnp.abs(t - r))

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # NaN/Inf guard (reference iterativedecomposition.py:535-540)
        ok = jnp.isfinite(loss)
        params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt, opt_state)
        return params, new_opt, loss

    t0 = time.time()
    for i in range(n_iterations):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, i)
        )
        if i % 100 == 0:
            print(f"iter {i} loss {float(loss):.4f}")
    jax.block_until_ready(loss)
    elapsed = time.time() - t0
    steps_per_sec = n_iterations / elapsed
    print(f"{steps_per_sec:.2f} overfit steps/sec")

    recon, vectors, times = model.apply(params, key)
    recon_summed = max_norm(jnp.sum(recon, axis=1, keepdims=True))

    # perturb event vectors to demonstrate manipulability (reference
    # hierarchical.py `perturbed`)
    perturb = jax.random.uniform(
        jax.random.PRNGKey(99), (1, 2, event_dim), minval=-0.5, maxval=0.5
    )
    perturbed, _, _ = model.apply(params, key, perturb)
    perturbed = max_norm(jnp.sum(perturbed, axis=1, keepdims=True))

    if article_path:
        spec = np.asarray(stft(recon_summed, 512, 256, pad=True))[0, 0].T
        conjure_article(
            article_path,
            "Audio Splatting With Physics-Inspired Event Generators",
            [
                AudioComponent(np.asarray(target[0, 0]), samplerate, "Original"),
                AudioComponent(
                    np.asarray(recon_summed[0, 0]), samplerate, "Reconstruction"
                ),
                AudioComponent(
                    np.asarray(perturbed[0, 0]), samplerate,
                    "Perturbed event vectors",
                ),
                ImageComponent(spec, "Reconstruction spectrogram"),
            ],
            intro_markdown=(
                f"# Audio splatting\n{n_events} events fit for "
                f"{n_iterations} iterations at {steps_per_sec:.1f} steps/sec."
            ),
        )
        print(f"article written to {article_path}")

    return params, steps_per_sec


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=3000)
    parser.add_argument("--n-events", type=int, default=64)
    parser.add_argument("--n-samples", type=int, default=2**16)
    parser.add_argument("--article", type=str, default=None)
    parser.add_argument("--audio-path", type=str, default=None)
    parser.add_argument("--iterative-loss", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()
    if args.tiny:
        args.n_samples, args.n_events, args.iterations = 2**13, 8, 50
    overfit_splat(
        n_samples=args.n_samples,
        n_events=args.n_events,
        n_iterations=args.iterations,
        article_path=args.article,
        audio_path=args.audio_path,
        use_iterative_loss=args.iterative_loss,
    )
