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
    """The codec's sparse representation of a segment.

    ``gains``/``shifts`` are the optional encode-time refinement
    corrections (:func:`mptpu.models.siam.refine_event_alignment` — the
    MP amplitude/phase fix-up): two scalars per event on the wire,
    negligible rate. ``None`` when encoding without refinement."""

    vecs: jax.Array       # (batch, n_events, context_dim)
    schedules: jax.Array  # (batch, n_events, n_frames)
    channels: jax.Array   # (batch, n_events, n_samples) rendered events
    gains: Optional[jax.Array] = None   # (batch, n_events)
    shifts: Optional[jax.Array] = None  # (batch, n_events) samples


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

    def encode(
        self, audio: jax.Array, refine: bool = False, max_shift: int = 256
    ) -> SIAMEncoding:
        """Fixed-length segment -> sparse events.

        ``refine=True`` runs the encode-time MP refinement pass
        (:func:`refine_event_alignment`): per-event shift+gain
        corrections against the original, carried on the wire as two
        scalars per event and applied by :meth:`decode`."""
        channels, vecs, schedules, _ = self._iterative(
            self.params, audio, self.key
        )
        if not refine:
            return SIAMEncoding(vecs, schedules, channels)
        from .siam import refine_event_alignment

        _, shifts, gains = refine_event_alignment(
            audio, channels, max_shift=max_shift
        )
        return SIAMEncoding(vecs, schedules, channels, gains, shifts)

    def decode(self, encoding: SIAMEncoding) -> jax.Array:
        """Events -> audio (re-render each event and sum), applying the
        encode-time gain/shift corrections when present."""
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
        channels = jnp.concatenate(outs, axis=1)
        if encoding.shifts is not None:
            n = channels.shape[-1]
            idx = (
                jnp.arange(n)[None, None, :] - encoding.shifts[..., None]
            ) % n
            channels = jnp.take_along_axis(channels, idx, axis=-1)
        if encoding.gains is not None:
            return jnp.einsum("be,ben->bn", encoding.gains, channels)[
                :, None
            ]
        return jnp.sum(channels, axis=1, keepdims=True)

    def reconstruct(self, audio: jax.Array, refit: bool = False) -> jax.Array:
        """``refit=True`` re-projects event amplitudes against the input
        via the OMP least-squares fix-up (:func:`refit_event_gains`) —
        legitimate at encode time, when the original is in hand; it can
        only lower waveform error vs the greedy amplitudes."""
        channels = self.encode(audio).channels
        if refit:
            from .siam import refit_event_gains

            gains = refit_event_gains(audio, channels)
            return jnp.einsum("be,ben->bn", gains, channels)[:, None]
        return jnp.sum(channels, axis=1, keepdims=True)

    def encode_streaming(self, audio: jax.Array):
        """Arbitrary-length audio via the half-overlap window walk."""
        return streaming_encode(self.model, self.params, audio, self.key)

    def embed(self, audio: jax.Array) -> np.ndarray:
        """Flat event-vector embedding for similarity search (the
        ``worker.py``/``search.py`` embedding surface)."""
        enc = self.encode(audio)
        return np.asarray(enc.vecs).reshape(audio.shape[0], -1)
