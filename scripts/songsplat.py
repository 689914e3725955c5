"""Whole-song splatting trainer (reference ``songsplat.py:731-843``):
fit one song-length event bank by sampling random segments, rendering
the events in range, and optimizing an STFT reconstruction loss plus a
straight-through l0 sparsity penalty on event times.

Usage:
  python scripts/songsplat.py [--iterations N] [--tiny] [--song path.wav]
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

from mptpu.models.songsplat import SongSplatModel
from mptpu.ops.stft import stft
from mptpu.obs import Collection, serve_collection
from mptpu.train import CheckpointManager
from mptpu.utils.wav import read_wav


def get_song(path: str | None, total_samples: int, samplerate: int) -> np.ndarray:
    """Load (or synthesize) the song (reference ``get_samples``,
    ``songsplat.py:681-688``)."""
    if path and os.path.exists(path):
        samples, sr = read_wav(path)
        if sr != samplerate:
            from mptpu.utils.wav import fft_resample_np

            samples = fft_resample_np(samples, sr, samplerate)
        if samples.shape[-1] < total_samples:
            samples = np.pad(samples, (0, total_samples - samples.shape[-1]))
        start = np.random.randint(0, max(1, samples.shape[-1] - total_samples))
        return samples[start : start + total_samples].astype(np.float32)
    from mptpu.data.synthetic import synthetic_audio

    # song-like density: ~4 note events/sec + sustained pedal tones
    # (the default 16 events over 24 s is mostly silence — trivially
    # zero loss on most segments and a meaningless whole-song SNR)
    return synthetic_audio(
        total_samples, n_events=int(total_samples / 22050 * 4),
        seed=42, sustained=True,
    )


def segment_stream(song: np.ndarray, model: SongSplatModel, seed: int = 0):
    """Random in-range segments; yields (batch (1,1,S), start_frame)
    (reference ``dataset``, ``songsplat.py:690-714``). Segments start at
    least one segment in (the extended window needs pre-context)."""
    rng = np.random.default_rng(seed)
    lo = model.segment_frames
    hi = model.total_frames - model.segment_frames
    while True:
        start_frame = int(rng.integers(lo, hi))
        s = start_frame * model.step_size
        chunk = song[s : s + model.n_segment_samples]
        yield jnp.asarray(chunk).reshape(1, 1, -1), start_frame


def spec_transform(x: jax.Array) -> jax.Array:
    """Reference ``transform`` = stft(x, 2048, 256) (``songsplat.py:38``)."""
    return stft(x, 2048, 256, pad=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--song", type=str, default=None)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--out", type=str, default="trained_weights/songsplat")
    parser.add_argument("--log-every", type=int, default=25)
    parser.add_argument("--sparsity", type=float, default=0.0)
    parser.add_argument("--refit", type=float, default=0.0,
                        help="per-segment OMP gain re-fit ridge for the "
                             "whole-song render (0 = raw amplitudes)")
    parser.add_argument("--watchdog-s", type=int, default=0,
                        help="hard in-process exit bound (0 = off)")
    parser.add_argument("--resume", action="store_true",
                        help="restore the newest checkpoint in --out "
                             "before training")
    parser.add_argument("--render-only", action="store_true",
                        help="skip training; render the whole-song "
                             "artifact from the newest checkpoint "
                             "(implies --resume)")
    args = parser.parse_args()
    if args.render_only:
        args.resume = True
    if args.watchdog_s:
        import faulthandler

        faulthandler.dump_traceback_later(args.watchdog_s, exit=True)

    if args.tiny:
        total_samples, segment_samples, eps, cap = 2**15, 2**12, 16.0, 8
    else:
        # reference config: 2^19-sample song, 2^15-sample segments
        total_samples, segment_samples, eps, cap = 2**19, 2**15, 8.0, 32

    model = SongSplatModel(
        total_samples=total_samples,
        n_segment_samples=segment_samples,
        events_per_second=eps,
        events_per_segment=cap,
    )
    song = get_song(args.song, total_samples, model.samplerate)
    stream = segment_stream(song, model)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.array(model.segment_frames), key)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(
        f"song {total_samples} samples, {model.total_events} events, "
        f"{n_params} params, compression ratio {model.compression_ratio:.4f}",
        flush=True,
    )

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    ckpt = CheckpointManager(args.out, every=250)
    start_iter = 0
    if args.resume:
        payload = ckpt.latest()
        if payload is None:
            if args.render_only:
                raise SystemExit(f"--render-only: no checkpoint in {args.out}")
            print("resume requested but no checkpoint found", flush=True)
        else:
            params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
            if payload.get("opt_state") is not None:
                opt_state = jax.tree_util.tree_map(
                    jnp.asarray, payload["opt_state"])
            start_iter = int(payload["step"]) + 1
            print(f"resumed from step {payload['step']}", flush=True)
    if args.render_only:
        args.iterations = 0
    collection = Collection(os.path.join(args.out, "dashboard"))
    server = serve_collection(collection, port=args.port) if args.port else None

    def loss_fn(params, target, start_frame, key):
        rendered, mask, sched, n_in_range = model.apply(params, start_frame, key)
        recon = jnp.sum(rendered, axis=1, keepdims=True)
        loss = jnp.abs(
            spec_transform(recon) - spec_transform(target)
        ).sum()
        if args.sparsity:
            loss = loss + args.sparsity * jnp.sum(sched)  # straight-through l0
        return loss, (recon, n_in_range)

    @jax.jit
    def train_step(params, opt_state, target, start_frame, key):
        (loss, (recon, n_in_range)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, target, start_frame, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, recon, n_in_range

    losses = []
    t0 = time.perf_counter()
    n_steps = 0
    for i in range(start_iter, args.iterations):
        n_steps += 1
        target, start_frame = next(stream)
        params, opt_state, loss, recon, n_in_range = train_step(
            params, opt_state, target, jnp.array(start_frame), jax.random.fold_in(key, i)
        )
        if i % args.log_every == 0:
            l = float(loss)
            losses.append(l)
            overflow = int(n_in_range) - model.events_per_segment
            extra = f" [RANGE-QUERY OVERFLOW: {overflow} events dropped]" \
                if overflow > 0 else ""
            print(f"iter {i} loss {l:.2f}{extra}", flush=True)
            collection.log("orig", np.asarray(target[0, 0]), kind="audio")
            collection.log("recon", np.asarray(recon[0, 0]), kind="audio")
            collection.log("loss", np.asarray(losses[-200:]))
        if i % 100 == 0 and i > 0:
            rnd = model.apply(
                # NOT -i: negative fold_in data overflows the uint32
                # coercion on this jax (crashed at iter 100)
                params, jax.random.fold_in(key, 2_000_000 + i),
                method=SongSplatModel.generate_random,
            )
            collection.log("random", np.asarray(jnp.sum(rnd, 1)[0]), kind="audio")
        ckpt.maybe_save(i, params, opt_state)

    elapsed = time.perf_counter() - t0
    if n_steps:
        from mptpu.train.checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(args.out, f"ckpt_{i:09d}.pkl"),
            params, opt_state, step=i,
        )
    trend = (
        f", loss {losses[0]:.1f} -> {losses[-1]:.1f}" if losses else ""
    )
    print(
        f"done: {n_steps} iters in {elapsed:.1f}s "
        f"({n_steps/max(elapsed, 1e-9):.2f} steps/s){trend}",
        flush=True,
    )

    # ---- whole-song artifact: tile non-overlapping segments across the
    # coverable range, optionally refitting per-segment event gains (the
    # OMP amplitude fix-up, mptpu/ops/refit.py), and score the result
    # (reference renders per-segment demo audio only, songsplat.py:551+)
    import json

    from mptpu.ops.refit import refit_gains
    from mptpu.utils.wav import write_wav

    @jax.jit
    def render_segment(params, start_frame, key):
        rendered, mask, sched, _ = model.apply(params, start_frame, key)
        return rendered

    recon_song = np.zeros(total_samples, np.float32)
    seg_frames = model.segment_frames
    covered_lo = seg_frames * model.step_size
    for start_frame in range(
        seg_frames, model.total_frames - seg_frames, seg_frames
    ):
        rendered = render_segment(
            params, jnp.array(start_frame),
            jax.random.fold_in(key, 100000 + start_frame),
        )
        s = start_frame * model.step_size
        tgt = jnp.asarray(
            song[s : s + model.n_segment_samples]
        ).reshape(1, 1, -1)
        if args.refit:
            g = refit_gains(tgt, rendered[..., : tgt.shape[-1]],
                            ridge=args.refit)
            seg = np.asarray(
                jnp.einsum("be,ben->bn", g, rendered)[0]
            ).reshape(-1)
        else:
            seg = np.asarray(jnp.sum(rendered, axis=1)[0]).reshape(-1)
        n = min(len(seg), total_samples - s)
        recon_song[s : s + n] = seg[:n]
    covered_hi = (model.total_frames - seg_frames) * model.step_size
    t_cov = song[covered_lo:covered_hi]
    r_cov = recon_song[covered_lo:covered_hi]
    snr = float(
        10 * np.log10(
            (np.sum(t_cov**2) + 1e-12)
            / (np.sum((t_cov - r_cov) ** 2) + 1e-12)
        )
    )
    # log-spectral distance over the covered region: the training loss
    # is magnitude-only (reference songsplat.py:38), so waveform SNR
    # sits near 0 by construction (unpinned phase) and the spectral
    # number is the one the optimizer actually moves
    ts = jnp.abs(spec_transform(jnp.asarray(t_cov).reshape(1, 1, -1)))
    rs = jnp.abs(spec_transform(jnp.asarray(r_cov).reshape(1, 1, -1)))
    lsd = float(jnp.sqrt(jnp.mean(
        (20 * jnp.log10(ts + 1e-8) - 20 * jnp.log10(rs + 1e-8)) ** 2
    )))
    eval_out = {
        "covered_snr_db": round(snr, 3),
        "covered_lsd_db": round(lsd, 3),
        "covered_samples": int(covered_hi - covered_lo),
        "total_samples": int(total_samples),
        "iterations": args.iterations,
        "trained_steps": start_iter - 1 + n_steps if start_iter else n_steps,
        "refit_ridge": args.refit,
        "final_loss": losses[-1] if losses else None,
    }
    print("song eval", json.dumps(eval_out), flush=True)
    with open(os.path.join(args.out, "song_eval.json"), "w") as f:
        json.dump(eval_out, f, indent=1)
    write_wav(os.path.join(args.out, "song_target.wav"), song,
              model.samplerate)
    write_wav(os.path.join(args.out, "song_recon.wav"), recon_song,
              model.samplerate)

    if server:
        server.shutdown()
    return losses


if __name__ == "__main__":
    main()
