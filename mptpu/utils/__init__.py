"""Utilities: music scales, WAV IO, weight init, reporting helpers."""

from .music import midi_to_hz, musical_scale_hz
from .wav import read_wav, write_wav

__all__ = ["midi_to_hz", "musical_scale_hz", "read_wav", "write_wav"]
