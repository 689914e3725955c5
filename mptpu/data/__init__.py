"""L5 data layer: file discovery, cached decode, infinite batch streams,
deterministic chunk iteration (reference ``data/`` — SURVEY.md §2.2)."""

from .datastore import (
    iter_files,
    audio,
    batch_stream,
    iter_chunks,
    iter_audio_segments,
)
from .audioiter import (
    audio_stream,
    AudioIterator,
    get_one_audio_segment,
    get_one_audio_batch,
)
from .synthetic import synthetic_audio, ensure_demo_dataset, streaming_windows
from .kv import KVCollection, cache
from .fetch import get_audio_segment, default_transport
from .native import NativeAudioLoader, native_available, build_native

__all__ = [
    "audio_stream",
    "iter_files",
    "audio",
    "batch_stream",
    "iter_chunks",
    "iter_audio_segments",
    "AudioIterator",
    "get_one_audio_segment",
    "get_one_audio_batch",
    "synthetic_audio",
    "streaming_windows",
    "ensure_demo_dataset",
    "KVCollection",
    "cache",
    "get_audio_segment",
    "default_transport",
    "NativeAudioLoader",
    "native_available",
    "build_native",
]
