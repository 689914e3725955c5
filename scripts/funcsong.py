"""Fit a whole song as a neural function of absolute position
(reference ``funcsong.py:288-372``): random crops + absolute-position
encodings -> FuncSong network -> STFT loss; logs the model-size /
song-size compression ratio every step.

No librosa in the image, so ``--path`` is optional: by default the
"song" is a long synthetic segment (``mptpu.data.synthetic``). The crop
start is a TRACED argument of the jitted step, so sampling new crops
never recompiles.

Run in the background to completion (never under ``timeout``; see
CLAUDE.md).
"""

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

from mptpu.models.funcsong import FuncSong, count_parameters, song_pos_encoding
from mptpu.ops.stft import stft
from mptpu.utils.wav import write_wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, default=None,
                   help="wav file to fit; default = synthetic song")
    p.add_argument("--song-seconds", type=float, default=30.0)
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--segment-samples", type=int, default=2**15)
    p.add_argument("--pos-channels", type=int, default=256)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="trained_weights/funcsong")
    p.add_argument("--smoke", action="store_true",
                   help="tiny config for CI: 2^11 samples, 8 pos channels")
    args = p.parse_args()

    faulthandler.dump_traceback_later(7200, exit=True)
    os.makedirs(args.out, exist_ok=True)

    if args.smoke:
        args.segment_samples, args.pos_channels = 2**11, 8
        args.hidden, args.layers, args.batch_size = 32, 2, 2

    samplerate = 22050
    if args.path:
        from mptpu.utils.wav import read_wav

        song, samplerate = read_wav(args.path)
        song = np.asarray(song, dtype=np.float32).reshape(-1)
    else:
        from mptpu.data.synthetic import synthetic_audio

        n = int(args.song_seconds * samplerate)
        song = synthetic_audio(
            n, samplerate, n_events=int(args.song_seconds * 4),
            seed=args.seed, sustained=True,
        )
    total_samples = len(song)
    song_dev = jnp.asarray(song)

    model = FuncSong(
        segment_size=args.segment_samples,
        in_channels=args.pos_channels,
        hidden_channels=args.hidden,
        n_layers=args.layers,
    )
    key = jax.random.PRNGKey(args.seed)
    pos0 = jnp.zeros((args.batch_size, args.pos_channels, args.segment_samples))
    params = jax.jit(model.init)(key, pos0)
    n_params = count_parameters(params)
    ratio = n_params / total_samples
    print(f"{n_params} params / {total_samples} samples = "
          f"compression ratio {ratio:.2f}", flush=True)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def batch_from_starts(starts):
        # starts: (batch,) traced int32 — gather crops + encodings on device
        def one(s):
            seg = jax.lax.dynamic_slice(
                song_dev, (s,), (args.segment_samples,)
            )
            pos = song_pos_encoding(
                s, args.segment_samples, total_samples, args.pos_channels
            )
            return seg, pos

        segs, pos = jax.vmap(one)(starts)
        return segs[:, None, :], pos

    def loss_fn(params, starts):
        target, pos = batch_from_starts(starts)
        recon = model.apply(params, pos)
        r = stft(recon, 2048, 256, pad=True)
        t = stft(target, 2048, 256, pad=True)
        return jnp.sum(jnp.abs(r - t)), recon

    @jax.jit
    def train_step(params, opt_state, starts):
        (loss, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, starts
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, recon

    rng = np.random.default_rng(args.seed)
    losses = []
    t0 = time.perf_counter()
    recon = None
    for i in range(args.iterations):
        starts = jnp.asarray(
            rng.integers(0, total_samples - args.segment_samples,
                         size=args.batch_size),
            dtype=jnp.int32,
        )
        params, opt_state, loss, recon = train_step(params, opt_state, starts)
        if i % 25 == 0:
            l = float(loss)
            losses.append([i, round(l, 2)])
            print(f"iter {i} loss {l:.2f} ratio {ratio:.2f}", flush=True)

    elapsed = time.perf_counter() - t0
    if recon is not None:
        write_wav(
            os.path.join(args.out, "recon_crop.wav"),
            np.asarray(recon[0, 0]), samplerate,
        )
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(
            {
                "n_params": n_params,
                "total_samples": total_samples,
                "compression_ratio": ratio,
                "losses": losses,
                "steps_per_s": args.iterations / max(elapsed, 1e-9),
            },
            f, indent=1,
        )
    print(f"done in {elapsed:.1f}s", flush=True)


if __name__ == "__main__":
    main()
