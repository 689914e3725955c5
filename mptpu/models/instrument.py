"""Interactive playable instrument over a trained SIAM codec (reference
``interactive.py`` — the ``@torch.jit.script sequential`` event-loop
instrument rendering events from a trained model under user-supplied
vectors and times; VERDICT r1 gap item 2).

TPU design: the per-sample force/damping recurrence is a ``lax.scan``
(the reference's TorchScript loop), and note rendering goes through the
codec's jitted ``generate`` — one compile per (event-count) shape, so an
interactive session replays notes with millisecond dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .inference import SIAMCodec


def damped_sequential(forces: jax.Array, damping: jax.Array) -> jax.Array:
    """``out[i] = (forces[i] + out[i-1]) * damping[i]`` along the last
    axis (reference ``interactive.py:22-30``, a TorchScript python loop —
    here one ``lax.scan`` over the time axis, vmapped over leading dims).
    """
    shape = forces.shape
    f = forces.reshape(-1, shape[-1])
    d = damping.reshape(-1, shape[-1])

    def step(prev, fd):
        fi, di = fd
        out = (fi + prev) * di
        return out, out

    def run(fi, di):
        _, out = lax.scan(step, jnp.zeros(()), (fi, di))
        return out

    return jax.vmap(run)(f, d).reshape(shape)


@dataclass
class Note:
    """One queued event: a latent vector, an onset (seconds), a gain."""

    vector: np.ndarray
    time_s: float
    amplitude: float = 1.0


@dataclass
class PlayableInstrument:
    """Render user-placed events through a trained SIAM decoder.

    Notes are (vector, onset, gain) tuples; vectors come from a bank
    (e.g. event vectors harvested from real audio at encode time) or
    from seeded random latents. Rendering builds a dirac scheduling row
    per note (the decoder's native scheduling format,
    ``iterativedecomposition.py:230-239``) and sums the generated events.
    """

    codec: SIAMCodec
    bank: Optional[np.ndarray] = None  # (n, context_dim) vector presets

    def __post_init__(self):
        self.model = self.codec.model
        self.samplerate = self.model.samplerate
        self._notes: List[Note] = []

    # ---- note sources ----

    def random_vector(self, seed: int = 0) -> np.ndarray:
        v = jax.random.normal(
            jax.random.PRNGKey(seed), (self.model.context_dim,)
        )
        return np.asarray(v)

    def bank_vector(self, index: int) -> np.ndarray:
        if self.bank is None or len(self.bank) == 0:
            raise ValueError("no vector bank loaded")
        return np.asarray(self.bank[index % len(self.bank)])

    def harvest_bank(self, audio: jax.Array) -> np.ndarray:
        """Fill the bank with event vectors encoded from real audio."""
        enc = self.codec.encode(audio)
        self.bank = np.asarray(enc.vecs).reshape(-1, self.model.context_dim)
        return self.bank

    # ---- sequencing ----

    def add_note(self, vector: np.ndarray, time_s: float, amplitude: float = 1.0):
        self._notes.append(Note(np.asarray(vector), float(time_s), float(amplitude)))

    def clear(self):
        self._notes = []

    @property
    def notes(self) -> List[Note]:
        return list(self._notes)

    # ---- rendering ----

    def _schedule_row(self, time_s: float, amplitude: float) -> np.ndarray:
        frames = self.model.n_frames
        frame = int(
            round(time_s * self.samplerate / self.model.transform_step_size)
        )
        frame = max(0, min(frames - 1, frame))
        row = np.zeros((frames,), dtype=np.float32)
        row[frame] = amplitude
        return row

    def render(
        self,
        notes: Optional[Sequence[Note]] = None,
        total_seconds: Optional[float] = None,
        key: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Render queued (or given) notes to one audio array.

        Events whose onset lies beyond the decoder's native window are
        placed by window: the song is tiled into n_samples windows and
        each note renders into its own window offset (the decoder's
        scheduling covers one window; onsets wrap within it).
        """
        notes = list(notes if notes is not None else self._notes)
        if not notes:
            return np.zeros((1, 1, self.model.n_samples), dtype=np.float32)
        key = key if key is not None else jax.random.PRNGKey(0)
        window_s = self.model.n_samples / self.samplerate
        end_s = max(n.time_s for n in notes) + window_s
        total_s = max(total_seconds or 0.0, end_s)
        total = int(np.ceil(total_s * self.samplerate))
        out = np.zeros((1, 1, total + self.model.n_samples), dtype=np.float32)

        for i, note in enumerate(notes):
            window_index = int(note.time_s // window_s)
            within = note.time_s - window_index * window_s
            vec = jnp.asarray(note.vector, jnp.float32)[None, None, :]
            sched = jnp.asarray(self._schedule_row(within, note.amplitude))[
                None, None, :
            ]
            audio = self.codec._generate(
                self.codec.params, vec, sched, jax.random.fold_in(key, i)
            )  # (1, 1, n_samples)
            start = window_index * self.model.n_samples
            seg = np.asarray(audio)[0, 0]
            out[0, 0, start : start + seg.shape[-1]] += seg
        return out[:, :, :total]
