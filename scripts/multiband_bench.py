"""Multiband dictionary codec benchmark — BASELINE config #2.

Reference configuration (``experiments/e_2024_4_24/experiment.py:20-42``):
7 octave bands (512..32768), 512 atoms x 128 taps per band, 2^15-sample
segments, 64 sparse-coding steps per band (448 events total per item).

Measures on the current default device (TPU under axon):
  - warm encode throughput (segments/sec and events/sec across all bands)
  - reconstruction SNR before and after dictionary-learning iterations
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(learn_iters: int = 10, batch: int = 4):
    from mptpu.utils.platform import apply_platform_from_env

    apply_platform_from_env()

    import jax
    import jax.numpy as jnp
    from mptpu.sparse import BandSpec, MultibandDictionaryLearning

    n_samples = 2**15
    steps = 64
    n_atoms, atom_size = 512, 128
    sizes = [512, 1024, 2048, 4096, 8192, 16384, 32768]

    model = MultibandDictionaryLearning(
        [
            BandSpec(
                s,
                n_atoms,
                atom_size,
                signal_samples=n_samples,
                is_lowest_band=(s == sizes[0]),
            )
            for s in sizes
        ],
        n_samples=n_samples,
    )

    rng = np.random.default_rng(0)
    # band-limited noise mixture as a stand-in signal with broadband energy
    t = np.arange(n_samples) / 22050.0
    sig = sum(
        np.sin(2 * np.pi * f * t) * np.exp(-t * d)
        for f, d in [(220, 1.0), (880, 2.0), (3520, 4.0)]
    )
    sig = sig + 0.1 * rng.standard_normal(n_samples)
    sig = (sig / np.abs(sig).max()).astype(np.float32)
    batch_np = np.tile(sig[None, None, :], (batch, 1, 1))
    batch_np += 0.01 * rng.standard_normal(batch_np.shape).astype(np.float32)
    x = jnp.asarray(batch_np)

    def snr(recon):
        num = float(jnp.sum(x**2))
        den = float(jnp.sum((x - recon) ** 2))
        return 10 * np.log10(num / den)

    # warm up / compile all 7 band programs
    print("compiling 7 band encode programs...", flush=True)
    t0 = time.time()
    recon, encoding = model.recon(x, steps)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    print(f"initial recon SNR (random dicts): {snr(recon):.2f} dB", flush=True)

    # warm encode throughput
    t0 = time.time()
    runs = 3
    for _ in range(runs):
        enc = model.encode(x, steps)
        # force completion
        for ev in enc.values():
            float(ev.values.sum())
    dt = (time.time() - t0) / runs
    events = steps * len(sizes) * batch
    print(
        f"encode: {dt * 1e3:.1f} ms/batch ({batch / dt:.2f} segments/sec, "
        f"{events / dt:.0f} events/sec)",
        flush=True,
    )

    # dictionary learning improves SNR at fixed sparsity
    print(f"learning {learn_iters} iterations...", flush=True)
    t0 = time.time()
    for i in range(learn_iters):
        model.learn(x, steps)
    print(f"learn: {(time.time() - t0) / learn_iters:.2f} s/iter", flush=True)
    recon, _ = model.recon(x, steps)
    print(f"post-learning recon SNR: {snr(recon):.2f} dB", flush=True)

    # round-trip through the global event-tuple wire format
    flat = model.flattened_event_tuples(model.encode(x, steps))
    decoded = model.decode_global(*flat, batch_size=batch, n_steps=steps)
    print(f"wire-format round-trip SNR: {snr(decoded):.2f} dB", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--learn-iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    a = p.parse_args()
    main(a.learn_iters, a.batch)
