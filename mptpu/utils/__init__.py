"""Utilities: music scales, WAV IO, playable conversion, HTML reporting,
remote weight storage."""

from .music import midi_to_hz, musical_scale_hz
from .wav import read_wav, write_wav
from .playable import encode_audio, playable
from .reporting import audio_data_url, audio_element, section, table_of_contents, html_page
from .remote import store_trained_weights_remotely, load_trained_weights_for_inference
from .platform import apply_platform_from_env
from .readmedocs import readme

__all__ = [
    "midi_to_hz",
    "musical_scale_hz",
    "read_wav",
    "write_wav",
    "encode_audio",
    "playable",
    "audio_data_url",
    "audio_element",
    "section",
    "table_of_contents",
    "html_page",
    "store_trained_weights_remotely",
    "load_trained_weights_for_inference",
    "apply_platform_from_env",
    "readme",
]
