"""Synthetic audio for tests/benchmarks when no dataset is mounted.

The reference assumes a local MusicNet mirror (``readme.md:98-103``); this
image has no audio data, so benchmarks and smoke tests synthesize
plausible material: sums of decaying harmonic tones + noise transients —
spectrally similar enough to exercise every codec path.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.wav import write_wav


def synthetic_audio(
    n_samples: int,
    samplerate: int = 22050,
    n_events: int = 16,
    seed: int = 0,
    sustained: bool = False,
) -> np.ndarray:
    """One mono segment of decaying-harmonic events (float32, max-normed).

    ``sustained=True`` adds slow-decay pedal tones underneath so the
    result has MusicNet-like density (energy everywhere) instead of
    sparse plinks — the regime the reference's SIAM training assumes.
    """
    rng = np.random.default_rng(seed)
    out = np.zeros(n_samples, dtype=np.float64)
    t = np.arange(n_samples) / samplerate
    for _ in range(n_events):
        f0 = rng.uniform(55.0, 1760.0)
        start = rng.integers(0, max(1, n_samples - samplerate // 4))
        dur = int(rng.uniform(0.05, 0.5) * samplerate)
        dur = min(dur, n_samples - start)
        env = np.exp(-np.linspace(0, rng.uniform(3, 12), dur))
        seg = np.zeros(dur)
        for h in range(1, 6):
            if f0 * h < samplerate / 2:
                seg += rng.uniform(0.2, 1.0) / h * np.sin(
                    2 * np.pi * f0 * h * t[:dur] + rng.uniform(0, 2 * np.pi)
                )
        # noise attack transient
        attack = min(256, dur)
        seg[:attack] += rng.standard_normal(attack) * np.linspace(1, 0, attack) * 0.5
        out[start : start + dur] += seg * env * rng.uniform(0.3, 1.0)
    if sustained:
        # pedal tones: long overlapping notes covering the whole segment
        n_pedal = max(4, int(n_samples / samplerate * 1.5))
        for _ in range(n_pedal):
            f0 = rng.uniform(65.0, 880.0)
            start = rng.integers(0, max(1, int(n_samples * 0.9)))
            dur = int(rng.uniform(1.0, 4.0) * samplerate)
            dur = min(dur, n_samples - start)
            env = np.exp(-np.linspace(0, rng.uniform(0.5, 2.0), dur))
            seg = np.zeros(dur)
            for h in range(1, 8):
                if f0 * h < samplerate / 2:
                    seg += rng.uniform(0.2, 1.0) / h * np.sin(
                        2 * np.pi * f0 * h * t[:dur] + rng.uniform(0, 2 * np.pi)
                    )
            out[start : start + dur] += seg * env * rng.uniform(0.2, 0.6)
    mx = np.abs(out).max() + 1e-8
    return (out / mx).astype(np.float32)


def ensure_demo_dataset(
    directory: str,
    n_files: int = 4,
    seconds: float = 12.0,
    samplerate: int = 22050,
    dense: bool = False,
    seed_offset: int = 0,
) -> str:
    """Write a small synthetic WAV corpus if the directory is empty.

    ``dense=True`` writes MusicNet-density material (overlapping events +
    sustained pedal tones, ~8 events/sec) — the data regime the SIAM
    energy-removal loss needs to avoid the silence-collapse local optimum
    (see BENCHMARKS.md SIAM notes). Dense and sparse corpora use distinct
    file prefixes so a directory previously populated with one kind is
    regenerated (not silently reused) when the other is requested."""
    os.makedirs(directory, exist_ok=True)
    prefix = "synthetic_dense_" if dense else "synthetic_"

    def is_kind(f: str, want_dense: bool) -> bool:
        if not (f.startswith("synthetic_") and f.endswith(".wav")):
            return False
        return f.startswith("synthetic_dense_") == want_dense

    names = os.listdir(directory)
    existing = [f for f in names if is_kind(f, dense)]
    if not existing:
        # remove the OTHER kind's synthetic files first: every consumer
        # streams the directory with '*.wav', so leaving them would
        # silently train on a mixed-density corpus
        for stale in names:
            if is_kind(stale, not dense):
                try:
                    os.remove(os.path.join(directory, stale))
                except OSError:
                    pass
        n = int(seconds * samplerate)
        n_events = int(seconds * 8) if dense else 16
        for i in range(n_files):
            write_wav(
                os.path.join(directory, f"{prefix}{i}.wav"),
                synthetic_audio(
                    n,
                    samplerate,
                    n_events=n_events,
                    seed=seed_offset + i,
                    sustained=dense,
                ),
                samplerate,
            )
    return directory


def fresh_segment_stream(
    batch_size: int,
    n_samples: int,
    samplerate: int = 22050,
    seed_base: int = 1_000_000,
    prefetch: int = 2,
):
    """Infinite stream of FRESHLY synthesized dense segments, one new seed
    per example, never repeating.

    Motivation (BENCHMARKS.md "Round 4: the training-amount hypothesis"):
    the fixed ``ensure_demo_dataset`` corpus is 144 s of content, and a
    30k-step run saw every second ~850 times — all holdout metrics
    plateaued by ~5k steps while training loss kept falling
    (memorization). The reference trains on ~34 h of MusicNet
    (``readme.md:98-103``); an infinite synthetic corpus is the closest
    this image can get to that data regime.

    Seed layout: example ``i`` of batch ``b`` uses
    ``seed_base + b * batch_size + i``. The default base (1e6) is
    disjoint from every ``ensure_demo_dataset`` corpus (training seeds
    0..n_files-1, holdout ``seed_offset`` 1000..) so the holdout stays
    held out. Synthesis runs in a daemon thread with a bounded queue so
    the ~10-30 ms/segment host cost overlaps device steps instead of
    serializing with them (one host core — see CLAUDE.md).

    Yields float32 arrays of shape ``(batch_size, 1, n_samples)``,
    max-normalized per example (the ``AudioIterator(normalize=True)``
    convention this replaces in ``scripts/siam_quality.py``).
    """
    import queue
    import threading

    dur = n_samples / samplerate
    n_events = max(4, int(dur * 8))
    q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=max(1, prefetch))

    def synth_loop() -> None:
        b = 0
        while True:
            batch = np.stack([
                synthetic_audio(
                    n_samples,
                    samplerate,
                    n_events=n_events,
                    seed=seed_base + b * batch_size + i,
                    sustained=True,
                )
                for i in range(batch_size)
            ])[:, None, :]
            q.put(batch)  # blocks when `prefetch` batches are ready
            b += 1

    threading.Thread(target=synth_loop, daemon=True).start()
    while True:
        yield q.get()


def streaming_windows(
    seg: np.ndarray, n_samples: int, n_win: int
) -> np.ndarray:
    """Stack the half-overlap window positions a streaming-walk decode
    visits over ``seg`` (reference ``iterativedecomposition.py:275-319``
    walks hop = n_samples/2): ``(n_win, n_samples)`` with window ``w``
    starting at ``w * n_samples // 2``. ``seg`` must be at least
    ``n_samples + (n_win - 1) * n_samples // 2`` long (the multi-window
    overfit trainer synthesizes exactly that length). Used by
    ``scripts/siam_overfit.py --stream-windows`` so every position the
    decode walk visits is in-distribution at train time."""
    half = n_samples // 2
    needed = n_samples + (n_win - 1) * half
    if seg.shape[-1] < needed:
        raise ValueError(
            f"segment of {seg.shape[-1]} samples too short for {n_win} "
            f"half-overlap windows of {n_samples} (need {needed})"
        )
    return np.stack(
        [seg[w * half : w * half + n_samples] for w in range(n_win)]
    )
