"""Convolution reverb: impulse-response bank, room chosen by
softmax/sparse-softmax, dry/wet mix (reference ``modules/reverb.py:14-167``).

The IR bank loads from ``Config.impulse_response_path()`` WAVs when
available; otherwise synthetic exponentially-decaying noise rooms are
generated (this image ships no IR corpus), keeping every caller runnable.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config.dotenv import Config
from ..ops.fft import simple_fft_convolve
from ..ops.ste import sparse_softmax
from ..nn.linear import LinearOutputStack
from ..utils.wav import read_wav


def _synthetic_rooms(n_rooms: int, n_samples: int, seed: int = 0) -> np.ndarray:
    """Exponentially-decaying noise IRs with varying RT60s."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n_rooms, n_samples), dtype=np.float32)
    for i in range(n_rooms):
        decay = np.exp(
            -np.linspace(0, rng.uniform(4.0, 30.0), n_samples)
        )
        out[i] = rng.standard_normal(n_samples) * decay * 0.1
    return out


def load_impulse_responses(
    path: Optional[str], n_samples: int, n_fallback_rooms: int = 8,
    normalize: bool = False,
) -> np.ndarray:
    """(n_rooms, n_samples) IR bank (reference
    ``NeuralReverb.tensors_from_directory``, ``reverb.py:31-54``)."""
    audio = []
    if path and os.path.isdir(path):
        for p in sorted(glob.iglob(os.path.join(path, "*.wav"))):
            a, _ = read_wav(p, mono=True)
            if len(a) < n_samples:
                a = np.pad(a, (0, n_samples - len(a)))
            else:
                a = a[:n_samples]
            audio.append(a[None, :])
    if not audio:
        rooms = _synthetic_rooms(n_fallback_rooms, n_samples)
    else:
        rooms = np.concatenate(audio, axis=0).astype(np.float32)
    if normalize:
        rooms = rooms / (np.max(rooms, axis=-1, keepdims=True) + 1e-8)
    return rooms


class NeuralReverb(nn.Module):
    """Room bank + linear room mix, applied via ortho FFT convolution
    (reference ``reverb.py:14-89``)."""

    size: int
    n_rooms: int
    impulses: Optional[np.ndarray] = None  # (n_rooms, size); learnable if None

    @nn.compact
    def __call__(self, x, reverb_mix):
        if self.impulses is None:
            rooms = self.param(
                "rooms",
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-0.01, maxval=0.01
                ),
                (self.n_rooms, self.size),
            )
        else:
            rooms = jnp.asarray(self.impulses)
        mix = reverb_mix[:, None, :] @ rooms  # (batch, 1, size)
        orig_shape = x.shape
        x = x.reshape(mix.shape[0], -1, mix.shape[-1])
        x = simple_fft_convolve(mix, x)
        return x.reshape(orig_shape)

    @staticmethod
    def rooms_from_config(n_samples: int) -> np.ndarray:
        return load_impulse_responses(
            Config.impulse_response_path(), n_samples
        )


class ReverbGenerator(nn.Module):
    """Context vector -> (room softmax, dry/wet softmax) -> reverb
    (reference ``reverb.py:92-167``)."""

    channels: int
    layers: int
    samplerate: int
    n_samples: int
    hard_choice: bool = False
    n_rooms: Optional[int] = None

    def setup(self):
        self.rooms = load_impulse_responses(
            Config.impulse_response_path(),
            self.n_samples,
            n_fallback_rooms=self.n_rooms or 8,
        )
        self.verb = NeuralReverb(
            self.n_samples, self.rooms.shape[0], impulses=self.rooms
        )
        self.to_mix = LinearOutputStack(
            self.channels, self.layers, out_channels=2
        )
        self.to_room = LinearOutputStack(
            self.channels, self.layers, out_channels=self.rooms.shape[0]
        )

    def __call__(self, context, dry, return_parameters: bool = False):
        n_rooms = self.rooms.shape[0]
        room_logits = self.to_room(context).reshape(-1, n_rooms)
        if self.hard_choice:
            rm = sparse_softmax(room_logits, normalize=True, axis=-1)
        else:
            rm = jax.nn.softmax(room_logits, axis=-1)

        mx = jax.nn.softmax(self.to_mix(context), axis=-1)
        wet = self.verb(dry, rm)
        stacked = jnp.stack([dry, wet], axis=-1)
        mx = mx.reshape(stacked.shape[0], stacked.shape[1], 1, 2)
        mixed = jnp.sum(stacked * mx, axis=-1)
        if return_parameters:
            return mixed, rm, mx
        return mixed
