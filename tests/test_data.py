"""Data layer tests: WAV IO round trip, KV cache, streams, native loader."""

import os

import numpy as np
import pytest

from mptpu.data import (
    AudioIterator,
    batch_stream,
    iter_files,
    synthetic_audio,
    ensure_demo_dataset,
    KVCollection,
    cache,
    native_available,
    NativeAudioLoader,
)
from mptpu.utils.wav import read_wav, write_wav


@pytest.fixture(scope="module")
def demo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    return ensure_demo_dataset(str(d), n_files=2, seconds=3.0)


def test_wav_round_trip(tmp_path):
    x = synthetic_audio(8192, seed=1)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 22050)
    y, sr = read_wav(path)
    assert sr == 22050
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2e-4)  # 16-bit quantization


def test_kv_collection(tmp_path):
    kv = KVCollection(str(tmp_path / "kv"))
    kv.put("a:1", np.arange(10, dtype=np.float32))
    kv.put("a:2", b"raw")
    kv.put("b:1", {"x": 1})
    np.testing.assert_array_equal(kv.get("a:1"), np.arange(10, dtype=np.float32))
    assert bytes(kv.get("a:2")) == b"raw"
    assert kv.get("b:1") == {"x": 1}
    assert list(kv.keys("a:")) == ["a:1", "a:2"]
    assert "a:1" in kv
    kv.delete("a:1")
    assert "a:1" not in kv

    calls = []

    @cache(kv)
    def expensive(n):
        calls.append(n)
        return np.ones(n)

    expensive(4)
    expensive(4)
    assert calls == [4]


def test_batch_stream_shapes(demo_dir):
    stream = batch_stream(demo_dir, "*.wav", 2, 4096, normalize=True, seed=0)
    batch = next(stream)
    assert batch.shape == (2, 4096)
    assert np.abs(batch).max() <= 1.0 + 1e-5


def test_overfit_stream_repeats(demo_dir):
    stream = batch_stream(demo_dir, "*.wav", 2, 2048, overfit=True, seed=0)
    a = next(stream)
    b = next(stream)
    np.testing.assert_array_equal(a, b)


def test_audio_iterator(demo_dir):
    it = AudioIterator(2, 2048, audio_path=demo_dir, seed=0)
    batch = next(iter(it))
    assert batch.shape == (2, 1, 2048)


@pytest.mark.skipif(not native_available(), reason="native loader not built")
def test_native_loader(demo_dir):
    paths = list(iter_files(demo_dir, "*.wav"))
    loader = NativeAudioLoader(
        paths, batch_size=3, n_samples=2048, normalize=True, seed=1
    )
    b = next(loader)
    assert b.shape == (3, 2048)
    assert np.isfinite(b).all()
    assert np.abs(b).max() <= 1.0 + 1e-5
    loader.close()


@pytest.mark.skipif(not native_available(), reason="native loader not built")
def test_native_loader_matches_python_reader(demo_dir, tmp_path):
    """The native WAV decoder must agree with the python one."""
    from mptpu.utils.wav import write_wav

    x = synthetic_audio(4096, seed=3)
    path = str(tmp_path / "check.wav")
    write_wav(path, x, 22050)
    # full-length window, step 1, no normalize: the only valid start is
    # within the virtual padding, so read via batch and locate content
    loader = NativeAudioLoader(
        [path], batch_size=1, n_samples=4096, step_size=4096, seed=0
    )
    b = next(loader)[0]
    loader.close()
    y, _ = read_wav(path)
    # batch window started at 0 (only aligned start within the file)
    np.testing.assert_allclose(b[: len(y)], y, atol=2e-4)


def test_fresh_segment_stream():
    """Infinite fresh-corpus stream: shape/norm convention, determinism
    for a given seed base, and never-repeating content across batches
    (the round-4 memorization fix, BENCHMARKS.md)."""
    from mptpu.data.synthetic import fresh_segment_stream

    s = fresh_segment_stream(2, 4096, seed_base=500_000, prefetch=1)
    b0, b1 = next(s), next(s)
    assert b0.shape == (2, 1, 4096) and b0.dtype == np.float32
    # per-example max-norm (the AudioIterator(normalize=True) convention)
    assert np.allclose(np.abs(b0).max(axis=-1), 1.0, atol=1e-3)
    # consecutive batches are fresh content, not a repeat
    assert not np.allclose(b0, b1)
    # deterministic replay for the same seed base
    s2 = fresh_segment_stream(2, 4096, seed_base=500_000, prefetch=1)
    np.testing.assert_array_equal(next(s2), b0)
    # a shifted base (the --resume path) yields the later batch's content
    s3 = fresh_segment_stream(2, 4096, seed_base=500_002, prefetch=1)
    np.testing.assert_array_equal(next(s3), b1)
