"""Logged-value collection (the conjure ``LmdbCollection`` + ``loggers``
equivalent; reference usages ``iterativedecomposition.py:394-425``,
``train/experiment_runner.py:124-176``).

Values persist in a sqlite KV; each named logger stores the latest value
plus a bounded history. Audio is stored as WAV bytes so the dashboard can
stream it straight into an <audio> element.
"""

from __future__ import annotations

import io
import json
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.kv import KVCollection
from ..utils.wav import write_wav


def encode_audio(samples: np.ndarray, samplerate: int = 22050) -> bytes:
    buf = io.BytesIO()
    import wave

    samples = np.nan_to_num(
        np.asarray(samples, dtype=np.float32).reshape(-1)
    )
    ints = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(samplerate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


class Collection:
    """Named loggers over a persistent KV store."""

    def __init__(self, path: str, history: int = 8):
        self.kv = KVCollection(path)
        self.history = history
        self._counters: Dict[str, int] = {}

    def log(self, name: str, value, kind: str = "array", samplerate: int = 22050):
        """kind: 'array' | 'audio' | 'scalar' | 'series'."""
        count = self._counters.get(name, 0)
        meta = {
            "kind": kind,
            "count": count,
            "time": time.time(),
            "samplerate": samplerate,
        }
        if kind == "audio":
            payload = encode_audio(np.asarray(value), samplerate)
            self.kv.put(f"v:{name}:latest", payload)
        elif kind == "scalar":
            meta["value"] = float(value)
            self.kv.put(f"v:{name}:latest", np.asarray(float(value)))
        else:
            self.kv.put(f"v:{name}:latest", np.asarray(value))
        self.kv.put(f"m:{name}", json.dumps(meta).encode())
        self._counters[name] = count + 1

    def latest(self, name: str):
        return self.kv.get(f"v:{name}:latest")

    def meta(self, name: str) -> dict:
        raw = self.kv.get(f"m:{name}")
        return json.loads(bytes(raw).decode())

    def names(self) -> List[str]:
        return [k[2:] for k in self.kv.keys("m:")]


def loggers(
    names: List[str],
    kind: str,
    collection: Collection,
    samplerate: int = 22050,
):
    """Conjure-style logger factory: returns one callable per name
    (reference usage ``iterativedecomposition.py:402-415``)."""
    k = "audio" if "audio" in kind else "array"

    def make(name):
        def log(value):
            collection.log(name, value, kind=k, samplerate=samplerate)

        return log

    return [make(n) for n in names]
