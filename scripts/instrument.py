"""Interactive playable instrument REPL (reference ``interactive.py`` —
render events from a trained checkpoint under user-supplied vectors and
times).

Usage:
  python scripts/instrument.py [--checkpoint DIR] [--tiny] [--demo out.wav]

REPL commands:
  note <time_s> [amp] [seed]   queue a random-latent note at time_s
  vec <i> <time_s> [amp]       queue bank vector i at time_s
  harvest                      fill the vector bank from a real segment
  render [out.wav]             render queued notes to WAV (+ dashboard)
  list | clear | quit
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np


def build(checkpoint: str | None, tiny: bool, noise_seed: int = 0,
          size_overrides: dict | None = None):
    from mptpu.models.inference import SIAMCodec
    from mptpu.models.instrument import PlayableInstrument
    from mptpu.models.siam import SIAMModel

    if tiny:
        model = SIAMModel(
            n_samples=2**13, context_dim=16, in_channels=257,
            hidden_channels=32, n_events=4,
            transform_window_size=512, transform_step_size=256,
        )
    elif size_overrides:
        # play a scaled-config checkpoint (e.g. the medium overfit runs:
        # n_samples 2^15, 16 events, hidden 64, context 32) — the model
        # geometry and attn escape knobs must match training exactly
        model = SIAMModel(
            n_samples=size_overrides["n_samples"],
            context_dim=size_overrides["context_dim"],
            in_channels=size_overrides["window"] // 2 + 1,
            hidden_channels=size_overrides["hidden"],
            n_events=size_overrides["n_events"],
            transform_window_size=size_overrides["window"],
            transform_step_size=256,
            fft_resonance=True,
            attn_floor=size_overrides.get("attn_floor", 0.0),
            attn_leak=size_overrides.get("attn_leak", 0.0),
        )
    else:
        model = SIAMModel()
    if checkpoint and checkpoint.endswith(".pkl"):
        # a specific checkpoint FILE (e.g. an overfit run's ema_best.pkl,
        # which CheckpointManager.latest() deliberately ignores)
        import jax.numpy as jnp

        from mptpu.train.checkpoint import load_checkpoint

        payload = load_checkpoint(checkpoint)
        if payload is None:
            raise SystemExit(f"unreadable checkpoint {checkpoint}")
        import jax

        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        codec = SIAMCodec(model=model, params=params, seed=noise_seed)
    else:
        codec = SIAMCodec(model=model, checkpoint_dir=checkpoint,
                          seed=noise_seed)
    return PlayableInstrument(codec)


def demo_phrase(inst, out_path: str, harvest_seed: int | None = None,
                harvest_wav: str | None = None):
    """One-shot: an arpeggio of notes (used by tests). With
    ``harvest_seed``/``harvest_wav`` the notes are event vectors
    harvested from a real segment through the trained encoder — the
    checkpoint's own learned sounds — instead of random latents
    (reference ``interactive.py``'s click-to-place workflow seeded from
    an encoded segment). ``harvest_wav`` points at a wav (e.g. an
    overfit run's own ``target.wav``) so the bank is exactly what the
    checkpoint memorized."""
    if harvest_wav is not None:
        import jax.numpy as jnp

        from mptpu.utils.wav import read_wav

        wav, _ = read_wav(harvest_wav)
        wav = np.asarray(wav, dtype=np.float32)[: inst.model.n_samples]
        if wav.shape[0] < inst.model.n_samples:
            wav = np.pad(wav, (0, inst.model.n_samples - wav.shape[0]))
        seg = jnp.asarray(wav).reshape(1, 1, -1)
        bank = inst.harvest_bank(seg)
        n = bank.shape[0]
        for i, t in enumerate([0.0, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0]):
            inst.add_note(inst.bank_vector(i % n), t,
                          amplitude=1.0 - 0.08 * i)
    elif harvest_seed is not None:
        from mptpu.data import AudioIterator

        seg = next(iter(AudioIterator(
            1, inst.model.n_samples, normalize=True, seed=harvest_seed
        )))
        bank = inst.harvest_bank(seg)
        n = bank.shape[0]
        for i, t in enumerate([0.0, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0]):
            inst.add_note(inst.bank_vector(i % n), t,
                          amplitude=1.0 - 0.08 * i)
    else:
        for i, t in enumerate([0.0, 0.25, 0.5, 0.75, 1.0]):
            inst.add_note(inst.random_vector(seed=i), t,
                          amplitude=1.0 - 0.1 * i)
    audio = inst.render()
    from mptpu.utils.wav import write_wav

    # output gain: a checkpoint's raw event amplitudes can be tiny (the
    # greedy amplitudes are miscalibrated — see refit_event_gains), so
    # peak-normalize the phrase like any synth's output stage
    peak = float(np.abs(audio).max()) + 1e-9
    gain = min(0.5 / peak, 1e4)
    audio = audio * gain
    print(f"output gain {gain:.1f}x (raw peak {peak:.5f})")
    write_wav(out_path, audio[0, 0], inst.samplerate)
    print(f"wrote {out_path} ({audio.shape[-1]} samples, "
          f"{audio.shape[-1]/inst.samplerate:.2f}s, rms "
          f"{float(np.sqrt(np.mean(audio**2))):.5f})")
    return audio


def repl(inst):
    from mptpu.utils.wav import write_wav

    print("mptpu instrument — 'note <t> [amp] [seed]', 'vec <i> <t> [amp]', "
          "'harvest', 'render [f.wav]', 'list', 'clear', 'quit'")
    while True:
        try:
            line = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        cmd, *rest = line.split()
        try:
            if cmd == "quit":
                break
            elif cmd == "note":
                t = float(rest[0])
                amp = float(rest[1]) if len(rest) > 1 else 1.0
                seed = int(rest[2]) if len(rest) > 2 else len(inst.notes)
                inst.add_note(inst.random_vector(seed), t, amp)
                print(f"queued note @{t}s amp {amp} (seed {seed})")
            elif cmd == "vec":
                i, t = int(rest[0]), float(rest[1])
                amp = float(rest[2]) if len(rest) > 2 else 1.0
                inst.add_note(inst.bank_vector(i), t, amp)
                print(f"queued bank[{i}] @{t}s amp {amp}")
            elif cmd == "harvest":
                from mptpu.data import AudioIterator

                seg = next(iter(AudioIterator(
                    1, inst.model.n_samples, normalize=True, seed=3
                )))
                bank = inst.harvest_bank(seg)
                print(f"bank: {bank.shape[0]} vectors")
            elif cmd == "render":
                path = rest[0] if rest else "instrument_out.wav"
                audio = inst.render()
                write_wav(path, audio[0, 0], inst.samplerate)
                print(f"wrote {path} ({audio.shape[-1]} samples)")
            elif cmd == "list":
                for j, n in enumerate(inst.notes):
                    print(f"{j}: t={n.time_s}s amp={n.amplitude}")
            elif cmd == "clear":
                inst.clear()
                print("cleared")
            else:
                print(f"unknown command {cmd!r}")
        except (IndexError, ValueError) as e:
            print(f"error: {e}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, default="trained_weights/siam")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--demo", type=str, default=None,
                        help="render a demo phrase to this wav and exit")
    parser.add_argument("--harvest-seed", type=int, default=None,
                        help="harvest the demo's note vectors from a real "
                             "segment (match the overfit trainer's --seed "
                             "to play the checkpoint's learned sounds)")
    parser.add_argument("--selection-leak", type=float, default=0.0,
                        help="match the checkpoint's training-time decoder "
                             "semantics (see scripts/siam_overfit.py)")
    parser.add_argument("--selection-floor", type=float, default=0.0)
    parser.add_argument("--harvest-wav", type=str, default=None,
                        help="harvest note vectors from this wav (e.g. an "
                             "overfit run's target.wav) instead of the "
                             "synthetic iterator")
    parser.add_argument("--noise-seed", type=int, default=0,
                        help="codec PRNG seed; a --fixed-noise overfit "
                             "checkpoint memorizes PRNGKey(42)'s draws, "
                             "so pass 42 to play its learned sounds")
    parser.add_argument("--n-samples-log2", type=int, default=0,
                        help="with --n-events/--hidden/--context-dim: "
                             "play a scaled-config checkpoint (must "
                             "match its training geometry)")
    parser.add_argument("--n-events", type=int, default=0)
    parser.add_argument("--hidden", type=int, default=0)
    parser.add_argument("--context-dim", type=int, default=0)
    parser.add_argument("--attn-floor", type=float, default=0.0)
    parser.add_argument("--attn-leak", type=float, default=0.0)
    parser.add_argument("--watchdog-s", type=int, default=0,
                        help="self-bound --demo renders (a wedged TPU "
                             "relay otherwise blocks forever); 0 = off "
                             "for the interactive REPL")
    args = parser.parse_args()
    if args.watchdog_s:
        import faulthandler

        faulthandler.dump_traceback_later(args.watchdog_s, exit=True)
    if args.selection_leak or args.selection_floor:
        from mptpu.sparse.quantize import set_selection_leak, set_selection_floor

        set_selection_leak(args.selection_leak)
        set_selection_floor(args.selection_floor)
    size_overrides = None
    if args.n_samples_log2:
        size_overrides = {
            "n_samples": 2 ** args.n_samples_log2,
            "n_events": args.n_events or 32,
            "hidden": args.hidden or 128,
            "context_dim": args.context_dim or 32,
            "window": 2048,
            "attn_floor": args.attn_floor,
            "attn_leak": args.attn_leak,
        }
    inst = build(args.checkpoint, args.tiny, noise_seed=args.noise_seed,
                 size_overrides=size_overrides)
    if args.demo:
        demo_phrase(inst, args.demo, harvest_seed=args.harvest_seed,
                    harvest_wav=args.harvest_wav)
    else:
        repl(inst)
