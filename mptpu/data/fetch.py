"""Remote audio-segment fetch (reference ``data/fetch.py:6-24``:
HTTP GET -> librosa decode -> fixed-length segment).

This image has zero network egress, so the transport is pluggable: the
default handles ``file://`` URLs and plain paths (exercising the full
decode/slice/pad path), and attempts ``urllib`` for http(s) so the code
works unchanged on a connected deployment. Pass ``transport=`` (a
``url -> bytes`` callable) to substitute any object store or service
client — the same pattern ``scripts/worker.py`` uses for its S3 analog.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

import numpy as np

from ..utils.wav import read_wav, fft_resample_np


def default_transport(url: str) -> bytes:
    """file:// and plain paths natively; http(s) via urllib when the
    environment has egress."""
    if url.startswith("file://"):
        path = url[len("file://") :]
        with open(path, "rb") as f:
            return f.read()
    if os.path.exists(url):
        with open(url, "rb") as f:
            return f.read()
    if url.startswith(("http://", "https://")):
        from urllib.request import urlopen  # zero-egress image: will raise

        with urlopen(url, timeout=30) as resp:
            return resp.read()
    raise ValueError(f"unsupported url: {url!r}")


def get_audio_segment(
    url: str,
    target_samplerate: int,
    start_sample: int,
    duration_samples: int,
    transport: Optional[Callable[[str], bytes]] = None,
) -> np.ndarray:
    """Fetch a URL, decode, resample to ``target_samplerate``, slice
    ``[start_sample : start_sample + duration_samples]``, zero-pad to the
    exact duration (reference ``get_audio_segment``, ``data/fetch.py:6``).
    """
    transport = transport or default_transport
    raw = transport(url)

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tmp:
        tmp.write(raw)
        tmp_path = tmp.name
    try:
        samples, sr = read_wav(tmp_path)
    finally:
        os.unlink(tmp_path)

    if sr != target_samplerate:
        samples = fft_resample_np(samples, sr, target_samplerate)

    segment = samples[start_sample : start_sample + duration_samples]
    diff = duration_samples - segment.shape[0]
    if diff > 0:
        segment = np.pad(segment, [(0, diff)])
    return segment.astype(np.float32)
