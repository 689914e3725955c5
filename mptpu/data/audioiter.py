"""Iterator facade over batch_stream (reference ``data/audioiter.py:7-80``,
``data/audiostream.py:10-43``). Yields jax arrays shaped
(batch, 1, n_samples)."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .datastore import batch_stream


def audio_stream(
    batch_size: int,
    n_samples: int,
    overfit: bool = False,
    normalize: bool = False,
    step_size: int = 1,
    pattern: Union[str, List[str]] = "*.wav",
    as_jax: bool = True,
    return_indices: bool = False,
    audio_path: Optional[str] = None,
    seed: Optional[int] = None,
):
    stream = batch_stream(
        audio_path,
        pattern,
        batch_size,
        n_samples,
        overfit=overfit,
        normalize=normalize,
        step_size=step_size,
        return_indices=return_indices,
        seed=seed,
    )
    for item in stream:
        if return_indices:
            batch, indices = item
        else:
            batch, indices = item, None
        batch = batch.reshape(-1, 1, n_samples)
        if as_jax:
            batch = jnp.asarray(batch)
        yield (batch, indices) if return_indices else batch


class AudioIterator:
    """(reference ``data/audioiter.py:7-45``)"""

    def __init__(
        self,
        batch_size: int,
        n_samples: int,
        samplerate: int = 22050,
        normalize: bool = False,
        overfit: bool = False,
        step_size: int = 1,
        pattern: Union[str, List[str]] = "*.wav",
        as_jax: bool = True,
        return_indices: bool = False,
        audio_path: Optional[str] = None,
        seed: Optional[int] = None,
    ):
        self.batch_size = batch_size
        self.n_samples = n_samples
        self.samplerate = samplerate
        self.normalize = normalize
        self.overfit = overfit
        self.step_size = step_size
        self.pattern = pattern
        self.as_jax = as_jax
        self.return_indices = return_indices
        self.audio_path = audio_path
        self.seed = seed

    def __iter__(self):
        return audio_stream(
            self.batch_size,
            self.n_samples,
            self.overfit,
            self.normalize,
            step_size=self.step_size,
            pattern=self.pattern,
            as_jax=self.as_jax,
            return_indices=self.return_indices,
            audio_path=self.audio_path,
            seed=self.seed,
        )


def get_one_audio_segment(
    n_samples: int,
    samplerate: int = 22050,
    pattern: Union[str, Tuple[str, ...]] = "*.wav",
    audio_path: Optional[str] = None,
    seed: Optional[int] = None,
):
    ai = AudioIterator(
        batch_size=1,
        n_samples=n_samples,
        samplerate=samplerate,
        normalize=True,
        overfit=True,
        pattern=pattern,
        audio_path=audio_path,
        seed=seed,
    )
    return next(iter(ai)).reshape(-1, 1, n_samples)


def get_one_audio_batch(
    batch_size: int,
    n_samples: int,
    samplerate: int = 22050,
    pattern: str = "*.wav",
    audio_path: Optional[str] = None,
    seed: Optional[int] = None,
):
    ai = AudioIterator(
        batch_size=batch_size,
        n_samples=n_samples,
        samplerate=samplerate,
        normalize=True,
        overfit=True,
        pattern=pattern,
        audio_path=audio_path,
        seed=seed,
    )
    return next(iter(ai)).reshape(-1, 1, n_samples)
