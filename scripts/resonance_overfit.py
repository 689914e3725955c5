"""Resonance-stack overfit (reference ``resonancemodel.py:871-1100``
``OverfitResonanceStack`` / ``freqdomain.py:573-760``
``OverfitAudioNetwork``): a learned latent drives a chain of resonance
blocks excited by noise impulses; losses = multiband spectrogram +
autocorrelation features + decay-template envelope (the spiking.py loss
family).

Usage: python scripts/resonance_overfit.py [--iterations N] [--tiny]
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
import flax.linen as nn

from mptpu.gen.transfer import ResonanceChain, make_waves
from mptpu.gen.impulse import GenerateImpulse
from mptpu.data import get_one_audio_segment
from mptpu.losses.multiband_spec import flattened_multiband_spectrogram
from mptpu.losses.autocorrelation import AutocorrelationLoss, DecayLoss
from mptpu.utils.music import musical_scale_hz
from mptpu.nn.init import uniform_init


class OverfitResonanceStack(nn.Module):
    """Latent -> noise impulse -> resonance chain (reference
    ``resonancemodel.py:871-940``)."""

    n_samples: int
    latent_dim: int = 16
    depth: int = 2
    n_atoms: int = 128

    @nn.compact
    def __call__(self, key):
        latent = self.param(
            "latent", uniform_init(0.1), (1, 1, self.latent_dim)
        )
        impulse = GenerateImpulse(
            latent_dim=self.latent_dim,
            channels=32,
            n_samples=min(4096, self.n_samples),
            n_filter_bands=16,
            encoding_channels=1,
        )(latent.reshape(1, self.latent_dim), key)
        impulse = jnp.pad(
            impulse.reshape(1, 1, -1),
            ((0, 0), (0, 0), (0, self.n_samples - min(4096, self.n_samples))),
        )
        f0s = musical_scale_hz(start_midi=21, stop_midi=106, n_steps=self.n_atoms)
        waves = make_waves(self.n_samples, [float(f) for f in f0s], 22050)
        chain = ResonanceChain(
            depth=self.depth,
            n_atoms=waves.shape[0],
            window_size=512,
            n_frames=self.n_samples // 256,
            total_samples=self.n_samples,
            mix_channels=4,
            channels=32,
            latent_dim=self.latent_dim,
            initial=waves,
        )
        out = chain(latent.reshape(1, self.latent_dim), impulse)
        return jnp.sum(out, axis=1, keepdims=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=500)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()

    n_samples = 2**12 if args.tiny else 2**15
    target = get_one_audio_segment(n_samples, 22050, seed=9).reshape(1, 1, -1)

    model = OverfitResonanceStack(n_samples=n_samples)
    key = jax.random.PRNGKey(0)
    params = model.init(key, key)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    ac = AutocorrelationLoss(n_channels=32, filter_size=128)
    dl = DecayLoss(n_samples, n_decays=8, window_size=256)

    def loss_fn(params, key):
        recon = model.apply(params, key)
        spec = jnp.abs(
            flattened_multiband_spectrogram(
                recon, stft_spec={"s": (64, 16)}, smallest_band_size=512
            )
            - flattened_multiband_spectrogram(
                target, stft_spec={"s": (64, 16)}, smallest_band_size=512
            )
        ).sum()
        return spec + 0.01 * ac(target, recon) + 0.1 * dl(target, recon), recon

    @jax.jit
    def step(params, opt_state, key):
        (loss, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    first = last = None
    for i in range(args.iterations):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, i))
        if i % 50 == 0:
            l = float(loss)
            first = first if first is not None else l
            last = l
            print(f"iter {i} loss {l:.2f}", flush=True)
    el = time.perf_counter() - t0
    print(
        f"done: {args.iterations} iters in {el:.1f}s "
        f"({args.iterations/el:.1f} steps/s), loss {first:.1f} -> {last:.1f}"
    )


if __name__ == "__main__":
    main()
