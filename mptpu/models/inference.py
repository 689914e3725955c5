"""Inference conveniences (reference ``inference.py`` / the report
generators' ``load_model`` pattern, e.g. ``v3blogpost.py:261``,
``streaming_report.py:110``): load trained weights, encode audio to sparse
events, decode events back to audio, embed segments."""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..train.checkpoint import CheckpointManager
from .siam import SIAMModel, make_iterative_fn, streaming_encode


class SIAMEncoding(NamedTuple):
    """The codec's sparse representation of a segment."""

    vecs: jax.Array       # (batch, n_events, context_dim)
    schedules: jax.Array  # (batch, n_events, n_frames)
    channels: jax.Array   # (batch, n_events, n_samples) rendered events


class SIAMCodec:
    """Trained SIAM model as an encode/decode/embed service."""

    def __init__(
        self,
        model: Optional[SIAMModel] = None,
        checkpoint_dir: Optional[str] = "trained_weights/siam",
        params=None,
        seed: int = 0,
    ):
        self.model = model or SIAMModel()
        self.key = jax.random.PRNGKey(seed)
        if params is not None:
            self.params = params
        else:
            payload = (
                CheckpointManager(checkpoint_dir).latest()
                if checkpoint_dir
                else None
            )
            if payload is not None:
                self.params = payload["params"]
            else:
                example = jnp.zeros((1, 1, self.model.n_samples))
                self.params = self.model.init(self.key, example, self.key)
        self._iterative = jax.jit(make_iterative_fn(self.model))
        self._generate = jax.jit(
            lambda p, v, s, k: self.model.apply(
                p, v, s, k, method=SIAMModel.generate
            )
        )

    def encode(self, audio: jax.Array) -> SIAMEncoding:
        """Fixed-length segment -> sparse events."""
        channels, vecs, schedules, _ = self._iterative(
            self.params, audio, self.key
        )
        return SIAMEncoding(vecs, schedules, channels)

    def decode(self, encoding: SIAMEncoding) -> jax.Array:
        """Events -> audio (re-render each event and sum)."""
        batch, n_events, _ = encoding.vecs.shape
        outs = []
        for i in range(n_events):
            outs.append(
                self._generate(
                    self.params,
                    encoding.vecs[:, i : i + 1],
                    encoding.schedules[:, i : i + 1],
                    jax.random.fold_in(self.key, i),
                )
            )
        return jnp.sum(jnp.concatenate(outs, axis=1), axis=1, keepdims=True)

    def reconstruct(self, audio: jax.Array) -> jax.Array:
        return jnp.sum(self.encode(audio).channels, axis=1, keepdims=True)

    def encode_streaming(self, audio: jax.Array):
        """Arbitrary-length audio via the half-overlap window walk."""
        return streaming_encode(self.model, self.params, audio, self.key)

    def embed(self, audio: jax.Array) -> np.ndarray:
        """Flat event-vector embedding for similarity search (the
        ``worker.py``/``search.py`` embedding surface)."""
        enc = self.encode(audio)
        return np.asarray(enc.vecs).reshape(audio.shape[0], -1)
