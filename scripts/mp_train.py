"""Greedy matching pursuit + dictionary learning trainer (reference
``mp.py`` — BASELINE config #1: learn a dictionary on streamed segments,
report recon SNR at fixed sparsity).

Usage:
  python scripts/mp_train.py [--n-atoms 512] [--atom-size 512]
      [--n-samples 16384] [--steps 100] [--sweeps 25] [--multiband]
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

from mptpu.data import AudioIterator
from mptpu.sparse import (
    sparse_code,
    dictionary_learning_step,
    reconstruct_from_events,
    BandSpec,
    MultibandDictionaryLearning,
)


def snr_db(target, recon):
    return float(
        10 * jnp.log10(jnp.sum(target**2) / (jnp.sum((target - recon) ** 2) + 1e-12))
    )


def train_flat(n_atoms, atom_size, n_samples, n_steps, sweeps, batch_size, audio_path):
    stream = iter(
        AudioIterator(batch_size, n_samples, normalize=True, audio_path=audio_path)
    )
    key = jax.random.PRNGKey(0)
    d = jax.random.uniform(key, (n_atoms, atom_size), minval=-1, maxval=1)

    code = jax.jit(lambda s, d: sparse_code(s, d, n_steps=n_steps))
    learn = jax.jit(lambda s, d: dictionary_learning_step(s, d, n_steps=n_steps))

    batch = next(stream)
    initial = snr_db(batch, reconstruct_from_events(code(batch, d), d))
    print(f"initial recon SNR @ {n_steps} atoms: {initial:.2f} dB")

    for i in range(sweeps):
        batch = next(stream)
        t0 = time.time()
        d = learn(batch, d)
        jax.block_until_ready(d)
        elapsed = time.time() - t0
        if i % 5 == 0 or i == sweeps - 1:
            result = code(batch, d)
            s = snr_db(batch, reconstruct_from_events(result, d))
            print(
                f"sweep {i}: recon SNR {s:.2f} dB "
                f"({n_steps * batch.shape[0] / elapsed:.1f} atoms/sec)"
            )
    return d


def train_multiband(n_atoms, atom_size, n_samples, n_steps, sweeps, batch_size, audio_path):
    specs = [
        BandSpec(size, n_atoms=n_atoms, atom_size=atom_size,
                 signal_samples=n_samples, is_lowest_band=(size == 512))
        for size in [512, 1024, 2048, 4096, 8192, 16384]
        if size <= n_samples
    ]
    model = MultibandDictionaryLearning(specs, n_samples)
    stream = iter(
        AudioIterator(batch_size, n_samples, normalize=True, audio_path=audio_path)
    )
    batch = next(stream)
    recon, _ = model.recon(batch, steps=n_steps)
    print(f"initial multiband SNR: {snr_db(batch, recon):.2f} dB")
    for i in range(sweeps):
        batch = next(stream)
        model.learn(batch, steps=n_steps)
        if i % 5 == 0 or i == sweeps - 1:
            recon, encoding = model.recon(batch, steps=n_steps)
            gi, ut, amp = model.flattened_event_tuples(encoding)
            print(
                f"sweep {i}: SNR {snr_db(batch, recon):.2f} dB, "
                f"{gi.shape[0]} events over {model.total_atoms} global atoms"
            )
    model.store("trained_weights")
    return model


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-atoms", type=int, default=512)
    parser.add_argument("--atom-size", type=int, default=512)
    parser.add_argument("--n-samples", type=int, default=16384)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--sweeps", type=int, default=25)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--multiband", action="store_true")
    parser.add_argument("--audio-path", type=str, default=None)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()
    if args.tiny:
        args.n_atoms, args.atom_size = 64, 128
        args.n_samples, args.steps, args.sweeps = 4096, 16, 4
    fn = train_multiband if args.multiband else train_flat
    fn(
        args.n_atoms,
        args.atom_size,
        args.n_samples,
        args.steps,
        args.sweeps,
        args.batch_size,
        args.audio_path,
    )
