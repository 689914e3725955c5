"""Whole-song splatting (reference ``songsplat.py:551-714``; VERDICT r1
gap item 3): one event bank spans the ENTIRE song — per-event latent
vectors plus time logits over the song's full frame grid — and training
samples random segments, renders only the events whose (hard) time falls
inside an extended segment window, and fits a spectrogram loss.

TPU design notes:
- The reference's range query produces a *dynamic* number of events
  (``Model.forward`` masks then boolean-indexes, raising on empty); under
  jit we select a fixed capacity of ``events_per_segment`` via
  ``lax.top_k`` over the in-range mask and zero out the overflow — static
  shapes, one compiled program for every segment position.
- The reference renders into a 2x window offset by one segment so events
  scheduled shortly BEFORE the segment still ring into it
  (``songsplat.py:644-672``); reproduced with a 2x-length generator and
  a final half-window slice.
- Time selection is the straight-through ``sparse_softmax`` over the
  extended window's frames, exactly like the reference's
  ``schedule_events``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..gen.splat import SplattingEventGenerator
from ..nn.multihead import MultiHeadTransform
from ..ops.ste import sparse_softmax


class SongSplatModel(nn.Module):
    """Song-length event bank + splatting decoder.

    ``__call__(start_frame, key)`` renders the segment beginning at
    ``start_frame`` (of the song's global frame grid, step = 256
    samples): returns (events (1, K, segment_samples), in-range mask
    (K,), one-hot times for sparsity losses).
    """

    total_samples: int
    n_segment_samples: int
    samplerate: int = 22050
    event_latent_dim: int = 32
    events_per_second: float = 8.0
    events_per_segment: int = 32  # fixed jit capacity for the range query
    step_size: int = 256

    @property
    def total_frames(self) -> int:
        return self.total_samples // self.step_size

    @property
    def segment_frames(self) -> int:
        return self.n_segment_samples // self.step_size

    @property
    def total_events(self) -> int:
        seconds = self.total_samples / self.samplerate
        return int(seconds * self.events_per_second)

    @property
    def compression_ratio(self) -> float:
        n_params = self.total_events * (self.event_latent_dim + 1)
        return n_params / self.total_samples

    def setup(self):
        rng = 0.01
        self.events = self.param(
            "events",
            lambda k, s: jax.random.uniform(k, s, minval=-rng, maxval=rng),
            (self.total_events, self.event_latent_dim),
        )
        self.times = self.param(
            "times",
            lambda k, s: jax.random.uniform(k, s, minval=-rng, maxval=rng),
            (self.total_events, self.total_frames),
        )
        # render window is 2x the segment so pre-segment onsets ring in
        self.generator = SplattingEventGenerator(
            n_samples=2 * self.n_segment_samples,
            samplerate=self.samplerate,
            n_resonance_octaves=16,
            n_frames=(2 * self.n_segment_samples) // self.step_size,
            hard_reverb_choice=False,
            hierarchical_scheduler=False,
            wavetable_resonance=False,
        )
        self.transform = MultiHeadTransform(
            self.event_latent_dim,
            hidden_channels=128,
            shapes=self.generator.shape_spec,
            n_layers=1,
        )

    def range_query(self, start_frame) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Indices (K,) of events whose hard time lands in the extended
        window [start_frame - segment_frames, start_frame +
        segment_frames), their validity mask, and the TRUE in-range count
        (reference ``songsplat.py:652-662``).

        The fixed ``lax.top_k`` capacity (K = ``events_per_segment``)
        silently drops in-range events beyond K in dense regions (lowest
        indices win) — unlike the reference's dynamic event count. The
        returned count lets callers detect/log the truncation; size the
        cap at >= ``events_per_second * 3 * segment_seconds`` so ordinary
        density never hits it."""
        hard = jnp.argmax(self.times, axis=-1)  # (total_events,)
        early = start_frame - self.segment_frames
        in_range = (hard >= early) & (hard < start_frame + self.segment_frames)
        score = in_range.astype(jnp.float32)
        _, idx = lax.top_k(score, self.events_per_segment)
        mask = in_range[idx]
        return idx, mask, jnp.sum(in_range)

    def __call__(self, start_frame, key: jax.Array):
        lo = self.segment_frames
        hi = self.total_frames - self.segment_frames
        if hi < lo:
            raise ValueError(
                f"total_samples must cover at least two segments "
                f"(total_frames {self.total_frames} < 2 x segment_frames "
                f"{self.segment_frames})"
            )
        if isinstance(start_frame, (int, np.integer)) and not (
            lo <= start_frame <= hi
        ):
            # concrete misuse gets the reference's error (songsplat.py:651);
            # traced values are clamped below (jit-safe)
            raise ValueError(
                f"start_frame {start_frame} outside valid range [{lo}, {hi}]"
            )
        # clamp so the range query and the logit window stay aligned
        # (dynamic_slice clamps silently otherwise)
        start_frame = jnp.clip(jnp.asarray(start_frame), lo, hi)
        idx, mask, n_in_range = self.range_query(start_frame)
        vecs = self.events[idx]  # (K, latent)

        # per-event logits over the extended window's frames
        early = start_frame - self.segment_frames
        window = jax.vmap(
            lambda row: lax.dynamic_slice(
                row, (early,), (2 * self.segment_frames,)
            )
        )(self.times[idx])  # (K, 2*segment_frames)
        sched = sparse_softmax(window, normalize=True, axis=-1)
        sched = sched * mask[:, None]

        heads = self.transform(vecs[None, ...])  # dict of (1, K, *shape)
        rendered = self.generator(heads, sched[None, ...], key)
        rendered = rendered * mask[None, :, None]
        # keep the second half: the segment itself (pre-window events
        # contribute only their ringing tails). n_in_range > K means the
        # fixed top_k capacity truncated events — callers should log it.
        return rendered[..., self.n_segment_samples :], mask, sched, n_in_range

    def generate_random(self, key: jax.Array, n_events: int = 8) -> jax.Array:
        """Random preview: existing event vectors at random times
        (reference ``generate_random``, ``songsplat.py:619-636``)."""
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jax.random.permutation(k1, self.total_events)[:n_events]
        vecs = self.events[idx]
        raw = jax.random.uniform(
            k2, (n_events, 2 * self.segment_frames), minval=-1.0, maxval=1.0
        )
        sched = sparse_softmax(raw, normalize=True, axis=-1)
        heads = self.transform(vecs[None, ...])
        rendered = self.generator(heads, sched[None, ...], k3)
        return rendered[..., self.n_segment_samples :]
