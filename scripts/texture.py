"""Texture synthesis by statistics matching (reference ``texture.py``):
overfit a raw-audio parameter buffer so its gammatone-envelope texture
statistics match a target segment's. ``--features scattering`` instead
matches first/second-order scattering coefficients
(``mptpu/perceptual/scattering.py``; reference ``modules/scattering.py``),
making this the end-to-end consumer of the scattering transform.

Usage:
  python scripts/texture.py [--iterations N] [--tiny] [--features texture|scattering]
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
from mptpu.obs import Collection
from mptpu.ops.norms import max_norm
from mptpu.perceptual.texture import AudioTextureFeatures
from mptpu.utils.wav import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--features", choices=("texture", "scattering"),
                   default="texture")
    p.add_argument("--out", type=str, default="trained_weights/texture")
    p.add_argument("--log-every", type=int, default=50)
    args = p.parse_args()

    n_samples = 2**12 if args.tiny else 2**17
    os.makedirs(args.out, exist_ok=True)

    target = get_one_audio_segment(n_samples, seed=5)
    target = max_norm(target)

    if args.features == "texture":
        feats = AudioTextureFeatures(
            n_samples,
            n_filters=16 if args.tiny else 64,
            filter_size=64,
            min_band_size=min(512, n_samples),
        )

        def featurize(x):
            return feats(x)
    else:
        from mptpu.perceptual.gammatone import gammatone_filter_bank
        from mptpu.perceptual.scattering import scattering_transform

        bank = jnp.asarray(gammatone_filter_bank(
            16 if args.tiny else 64, 128, band_spacing="geometric"
        ))

        def featurize(x):
            c1, c2 = scattering_transform(x.reshape(x.shape[0], -1), bank)
            return jnp.concatenate(
                [c1.reshape(x.shape[0], -1), c2.reshape(x.shape[0], -1)],
                axis=-1,
            )

    target_features = featurize(target)

    # OverfitRawAudio equivalent (reference modules/overfitraw.py:7-21):
    # the raw waveform IS the parameter vector, max-normed on render
    params = jax.random.normal(jax.random.PRNGKey(0), target.shape) * 0.01
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            audio = max_norm(p)
            return jnp.abs(featurize(audio) - target_features).sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    collection = Collection(os.path.join(args.out, "dashboard"))
    collection.log("target", np.asarray(target[0, 0]), kind="audio")

    losses = []
    t0 = time.perf_counter()
    for i in range(args.iterations):
        params, opt_state, loss = step(params, opt_state)
        if i % args.log_every == 0:
            l = float(loss)
            losses.append(l)
            print(f"iter {i} loss {l:.2f}", flush=True)
            collection.log(
                "recon", np.asarray(max_norm(params)[0, 0]), kind="audio"
            )
            collection.log("loss", np.asarray(losses))
    recon = np.asarray(max_norm(params)[0, 0])
    write_wav(os.path.join(args.out, "recon.wav"), recon, 22050)
    write_wav(
        os.path.join(args.out, "target.wav"), np.asarray(target[0, 0]), 22050
    )
    elapsed = time.perf_counter() - t0
    print(
        f"done: {args.iterations} iters in {elapsed:.1f}s, "
        f"loss {losses[0]:.1f} -> {float(loss):.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
