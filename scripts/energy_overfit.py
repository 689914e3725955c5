"""Energy-conserving instrument overfit (reference ``energy.py:154-308``
``OverfitEnergyModel``/``train_and_monitor``): a sparse impulse control
signal drives the block-decay instrument; loss = STFT reconstruction +
block-boundary discontinuity penalty.

Usage: python scripts/energy_overfit.py [--iterations N] [--tiny]
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

from mptpu.gen.energy import (
    EnergyInstrumentModel,
    compute_discontinuity,
    to_blocks,
)
from mptpu.data import get_one_audio_segment
from mptpu.ops.stft import stft


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=500)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--disc-weight", type=float, default=0.1)
    args = parser.parse_args()

    if args.tiny:
        n_samples, block, channels, layers = 2**12, 128, 32, 2
    else:
        n_samples, block, channels, layers = 2**15, 512, 128, 3

    target = get_one_audio_segment(n_samples, 22050, seed=5).reshape(1, 1, -1)
    model = EnergyInstrumentModel(
        input_channels=1,
        model_channels=channels,
        block_size=block,
        n_layers=layers,
    )
    key = jax.random.PRNGKey(0)
    # sparse impulse excitation (learned amplitudes at fixed sites)
    n_impulses = 16
    sites = np.linspace(0, n_samples - block, n_impulses).astype(int)

    params = model.init(key, jnp.zeros((1, 1, n_samples)))
    amps0 = jnp.ones((n_impulses,)) * 0.1
    state = {"model": params, "amps": amps0}
    opt = optax.adam(1e-3)
    opt_state = opt.init(state)

    def control_from_amps(amps):
        ctrl = jnp.zeros((1, 1, n_samples))
        return ctrl.at[0, 0, jnp.asarray(sites)].set(amps)

    def loss_fn(state):
        recon = model.apply(state["model"], control_from_amps(state["amps"]))
        spec_l = jnp.abs(
            stft(recon, 2048, 256, pad=True) - stft(target, 2048, 256, pad=True)
        ).sum()
        disc = compute_discontinuity(to_blocks(recon, block))
        return spec_l + args.disc_weight * disc, (recon, spec_l, disc)

    @jax.jit
    def step(state, opt_state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state)
        updates, opt_state = opt.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, loss, aux

    t0 = time.perf_counter()
    first = last = None
    for i in range(args.iterations):
        state, opt_state, loss, (recon, spec_l, disc) = step(state, opt_state)
        if i % 50 == 0:
            l = float(loss)
            first = first if first is not None else l
            last = l
            print(
                f"iter {i} loss {l:.2f} (spec {float(spec_l):.2f} "
                f"disc {float(disc):.3f})",
                flush=True,
            )
    el = time.perf_counter() - t0
    print(
        f"done: {args.iterations} iters in {el:.1f}s "
        f"({args.iterations/el:.1f} steps/s), loss {first:.1f} -> {last:.1f}"
    )


if __name__ == "__main__":
    main()
