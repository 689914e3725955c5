"""File discovery, cached decode, infinite batch streams (reference
``data/datastore.py:16-163``).

Decoding uses pure-numpy WAV IO (this image has no librosa); decoded
signals are memoized in a sqlite KV (the LMDB analog). If no audio path is
configured, streams fall back to the synthetic corpus so every training
script runs out of the box.
"""

from __future__ import annotations

import os
from fnmatch import fnmatch
from typing import Iterable, List, Tuple, Union

import numpy as np

from ..config.dotenv import Config
from ..utils.wav import read_wav, fft_resample_np
from .kv import KVCollection, cache
from .synthetic import ensure_demo_dataset

_collection = None


def _get_collection() -> KVCollection:
    global _collection
    if _collection is None:
        _collection = KVCollection(
            os.path.join(Config.cache_path(), "audio")
        )
    return _collection


def iter_files(base_path, pattern: Union[str, List[str]]):
    """Recursive pattern-matched file walk (reference
    ``datastore.py:16-30``)."""

    def matches(path):
        if isinstance(pattern, str):
            return fnmatch(path, pattern)
        return any(fnmatch(path, p) for p in pattern)

    for dirpath, _, filenames in os.walk(base_path):
        for fn in filenames:
            full = os.path.join(dirpath, fn)
            if matches(full):
                yield full


def iter_files_in_random_order(base_path, pattern, rng=None):
    filenames = list(iter_files(base_path, pattern))
    rng = rng or np.random.default_rng()
    perm = rng.permutation(len(filenames))
    yield from (filenames[i] for i in perm)


def _decode(path: str, samplerate: int = 22050) -> np.ndarray:
    x, sr = read_wav(path, mono=True)
    if sr != samplerate:
        x = fft_resample_np(x, sr, samplerate)
    return x.astype(np.float32)


def audio(path: str, samplerate: int = 22050) -> np.ndarray:
    """Decode + memoize (reference ``datastore.py:40-45``)."""
    coll = _get_collection()
    key = f"audio:{path}:{samplerate}"
    try:
        return coll.get(key)
    except KeyError:
        x = _decode(path, samplerate)
        coll.put(key, x)
        return x


def _resolve_path(path=None) -> str:
    path = path or Config.audio_path()
    if path is None or not os.path.isdir(path) or not any(
        True for _ in iter_files(path, "*.wav")
    ):
        path = ensure_demo_dataset(
            os.path.join(Config.cache_path(), "demo_audio")
        )
    return path


def batch_stream(
    path,
    pattern: Union[str, List[str]],
    batch_size: int,
    n_samples: int,
    overfit: bool = False,
    normalize: bool = False,
    step_size: int = 1,
    return_indices: bool = False,
    seed: int | None = None,
):
    """Infinite generator of (batch_size, n_samples) numpy batches:
    random file -> random step-snapped window -> optional max-normalize;
    overfit mode repeats one batch forever (reference
    ``datastore.py:112-163``)."""
    path = _resolve_path(path)
    paths = list(iter_files(path, pattern))
    if not paths:
        raise FileNotFoundError(f"no files matching {pattern} under {path}")
    rng = np.random.default_rng(seed)
    batch_size = 1 if overfit else batch_size

    while True:
        batch = np.zeros((batch_size, n_samples), dtype=np.float32)
        indices = []
        for i in range(batch_size):
            # short files are padded to 2*n_samples, so a random window can
            # land entirely in the zero padding (or in recorded silence);
            # resample a few times for a segment with actual energy — a
            # silent target makes every energy-matching loss degenerate
            for _attempt in range(8):
                p = paths[rng.integers(len(paths))]
                data = audio(p)
                diff = int(np.clip((n_samples * 2) - data.shape[-1], 0, np.inf))
                if diff > 0:
                    data = np.concatenate([data, np.zeros(diff, np.float32)])
                positions = (data.shape[0] - n_samples) // step_size
                start = int(rng.integers(0, positions)) * step_size
                end = start + n_samples
                if float(np.abs(data[start:end]).max()) > 1e-4:
                    break
            indices.append((start, end))
            batch[i] = data[start:end]

        if normalize:
            batch = batch / (np.abs(batch).max(axis=-1, keepdims=True) + 1e-12)

        if return_indices:
            yield batch, indices
        else:
            yield batch

        if overfit:
            while True:
                yield (batch, indices) if return_indices else batch


def iter_chunks(path, pattern, chunksize) -> Iterable[Tuple[str, int, int]]:
    """Deterministic (filepath, start, stop) chunk walk (reference
    ``datastore.py:59-70``)."""
    for fp in iter_files(_resolve_path(path), pattern):
        data = audio(fp)
        for i in range(0, len(data), chunksize):
            yield fp, i, i + chunksize


def iter_audio_segments(
    path: str,
    pattern,
    chunksize: int,
    make_key=lambda fp, start, stop: f"{fp}_{start}_{stop}",
) -> Iterable[Tuple[str, np.ndarray]]:
    """Max-normalized (key, (1, 1, chunksize)) segments in random file
    order (reference ``datastore.py:72-90``)."""
    for fp in iter_files_in_random_order(_resolve_path(path), pattern):
        data = audio(fp).reshape(1, 1, -1)
        total = data.shape[-1]
        for i in range(0, total - chunksize, chunksize):
            chunk = data[:, :, i : i + chunksize]
            chunk = chunk / (chunk.max() + 1e-8)
            yield make_key(fp, i, i + chunksize), chunk
