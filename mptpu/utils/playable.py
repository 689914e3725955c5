"""Audio IO helpers (reference ``util/playable.py:16-81``): WAV
encode/decode to bytes, normalized playable conversion."""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_audio(samples, samplerate: int = 22050) -> bytes:
    """float array -> 16-bit WAV bytes (reference ``playable.py:16-41``)."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    ints = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(samplerate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def playable(x, samplerate: int = 22050, normalize: bool = True) -> np.ndarray:
    """Array-like -> mono float32, optionally max-normalized (the zounds
    ``playable`` analog, reference ``playable.py:43-66``)."""
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    if normalize:
        x = x / (np.abs(x).max() + 1e-8)
    return x
