"""Room-simulation demo (reference ``roomsim.py:213-261``): inject an
impulse into a 5x17x9-voxel room with random per-voxel transfer
functions, record the room's response, and (optionally) overfit the
learnable 2-D :class:`RoomModel` to a target recording
(``voxel.py``'s evident goal).

Outputs ``recording.wav`` + ``frames.npy`` (the energy movie the
reference renders as a gif) under ``--out``."""

from __future__ import annotations

import argparse
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

from mptpu.gen.roomsim import RoomModel, roomsim
from mptpu.utils.wav import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--block-size", type=int, default=64)
    p.add_argument("--n-frames", type=int, default=512)
    p.add_argument("--width", type=int, default=5)
    p.add_argument("--height", type=int, default=17)
    p.add_argument("--depth", type=int, default=9)
    p.add_argument("--samplerate", type=int, default=22050)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--overfit-steps", type=int, default=0,
                   help="also fit RoomModel to the rendered recording")
    p.add_argument("--out", type=str, default="trained_weights/roomsim")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    n_coeffs = args.block_size // 2 + 1

    wavelength_ft = 1125.33 / (args.samplerate / args.block_size)
    print(
        f"room is {wavelength_ft * args.width:.1f} x "
        f"{wavelength_ft * args.height:.1f} x "
        f"{wavelength_ft * args.depth:.1f} ft", flush=True,
    )

    rng = np.random.default_rng(args.seed)
    transfer = rng.uniform(
        0.99, 0.9999, (n_coeffs, args.width, args.height, args.depth)
    ) * np.linspace(1, 0, n_coeffs)[:, None, None, None] ** 0.5
    transfer[0] = 0.0

    control = np.zeros(
        (args.n_frames, args.block_size, args.width, args.height, args.depth),
        dtype=np.float32,
    )
    control[0, :, 3, 3, 3] = rng.uniform(-1, 1, args.block_size)

    t0 = time.perf_counter()
    recording, frames = jax.jit(roomsim)(
        jnp.asarray(transfer, jnp.float32), jnp.asarray(control)
    )
    recording = np.asarray(recording)
    sim_s = time.perf_counter() - t0
    print(
        f"simulated {len(recording) / args.samplerate:.2f}s of audio "
        f"in {sim_s:.2f}s", flush=True,
    )

    peak = np.abs(recording).max() + 1e-9
    write_wav(
        os.path.join(args.out, "recording.wav"),
        recording / peak, args.samplerate,
    )
    np.save(os.path.join(args.out, "frames.npy"), np.asarray(frames))

    metrics = {"sim_seconds": sim_s, "n_samples": int(len(recording))}

    if args.overfit_steps:
        target = jnp.asarray(recording / peak).reshape(1, 1, -1)
        model = RoomModel(
            room_size=args.width, voxel_size=args.block_size,
            n_frames=args.n_frames,
        )
        params = model.init(jax.random.PRNGKey(args.seed))
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(params):
                recon = model.apply(params)
                return jnp.mean((recon - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for i in range(args.overfit_steps):
            params, opt_state, loss = step(params, opt_state)
            if i % 25 == 0:
                losses.append([i, float(loss)])
                print(f"overfit iter {i} mse {float(loss):.6f}", flush=True)
        metrics["overfit_losses"] = losses

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
