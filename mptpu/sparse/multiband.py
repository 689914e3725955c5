"""Multiband dictionary learning: per-octave-band matching pursuit over an
FFT frequency decomposition.

Capability parity with reference ``modules/multibanddict.py`` (``BandSpec``
``:53``, ``MultibandDictionaryLearning`` ``:282``, local<->global event
tuple codec ``:189-235``, ``learn``/``encode``/``decode``/``recon``
``:394-473``). Each band has a static size, so every band's sparse-code /
dictionary-learning program compiles once; bands are pure orchestration
around the ``lax.scan`` MP engine.

Events travel as struct-of-arrays (``SparseCodeResult``) locally, and as
``(global_atom_index, position_unit_time, amplitude)`` arrays globally —
the jit-friendly analog of the reference's python tuple lists.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..ops.decompose import (
    fft_frequency_decompose,
    fft_frequency_recompose,
    fft_resample,
)
from ..ops.norms import unit_norm
from .fast_mp import sparse_code_fast
from .matching_pursuit import (
    SparseCodeResult,
    dictionary_learning_step,
    scatter_events,
    sparse_code,
)

# jitted wrappers — eager per-op dispatch is slow on TPU and some eager
# complex ops are unimplemented on the axon backend; band sizes are static
# so each band compiles exactly once.


@partial(jax.jit, static_argnames=("n_steps", "approx"))
def _jit_sparse_code(signal, d, n_steps, approx):
    if approx is None:
        # exact single-channel coding: the incremental-gram engine
        # produces identical event sequences ~25x faster; on TPU the
        # fully-fused Pallas step kernel adds another ~2.4x when the
        # band/atom shapes satisfy its alignment gate (sparse_code_fast
        # checks the gate itself and falls back to block_argmax)
        atom_size = d.shape[-1]
        # shrink the block only when the fused gate can actually use it
        # (atom_size >= 128); otherwise keep the default 512 so the
        # block_argmax fallback's max table stays small
        block = min(512, atom_size) if atom_size >= 128 else 512
        return sparse_code_fast(
            signal,
            d,
            n_steps=n_steps,
            block=block,
            fused=jax.default_backend() != "cpu",
            block_argmax=True,
        )
    return sparse_code(signal, d, n_steps=n_steps, approx=approx)


@partial(jax.jit, static_argnames=("n_steps", "approx"))
def _jit_dict_learn(signal, d, n_steps, approx):
    return dictionary_learning_step(signal, d, n_steps=n_steps, approx=approx)


@partial(jax.jit, static_argnames=("n_samples", "batch"))
def _jit_scatter(atom_indices, positions, values, d, n_samples, batch):
    return scatter_events(
        atom_indices, positions, values, d, n_samples, channels=1, batch=batch
    )


@partial(jax.jit, static_argnames=("min_size",))
def _jit_decompose(x, min_size):
    return fft_frequency_decompose(x, min_size)


@partial(jax.jit, static_argnames=("desired_size",))
def _jit_recompose(bands, desired_size):
    return fft_frequency_recompose(bands, desired_size)


@dataclass
class BandSpec:
    """One octave band's dictionary + codec (reference
    ``multibanddict.py:53-279``)."""

    size: int
    n_atoms: int
    atom_size: int
    slce: Optional[slice] = None
    signal_samples: int = 0
    samplerate: int = 22050
    is_lowest_band: bool = False
    d: jax.Array = field(default=None)  # (n_atoms, atom_size), unit-norm

    def __post_init__(self):
        if self.d is None:
            key = jax.random.PRNGKey(self.size)
            d = jax.random.uniform(
                key, (self.n_atoms, self.atom_size), minval=-1.0, maxval=1.0
            )
            self.d = unit_norm(d)

    @property
    def n_samples_at_native_rate(self) -> int:
        ratio = self.signal_samples // self.size
        return self.atom_size * ratio

    def resampled_atoms(self) -> jax.Array:
        """Atoms upsampled to the native signal rate (reference
        ``multibanddict.py:109-115``)."""
        return fft_resample(
            self.d.reshape(self.n_atoms, 1, self.atom_size),
            self.n_samples_at_native_rate,
            self.is_lowest_band,
        )

    def shape(self, batch_size: int) -> Tuple[int, int, int]:
        return (batch_size, 1, self.size)

    @property
    def filename(self) -> str:
        return f"band_{self.size}.dat"

    def get_atom(self, index, norm):
        return self.d[index] * norm

    def load(self, directory: str = "."):
        import os

        path = os.path.join(directory, self.filename)
        try:
            with open(path, "rb") as f:
                self.d = jnp.asarray(pickle.load(f))
        except IOError:
            pass

    def store(self, directory: str = "."):
        import os

        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, self.filename)
        with open(path, "wb") as f:
            pickle.dump(np.asarray(self.d), f)

    def learn(self, batch: jax.Array, steps: int = 16) -> jax.Array:
        self.d = unit_norm(_jit_dict_learn(batch, self.d, steps, self.slce))
        return self.d

    def encode(self, batch: jax.Array, steps: int = 16) -> SparseCodeResult:
        return _jit_sparse_code(batch, self.d, steps, self.slce)

    def decode(self, events: SparseCodeResult, batch_size: int) -> jax.Array:
        return _jit_scatter(
            events.atom_indices,
            events.positions,
            events.values,
            self.d,
            self.size,
            batch_size,
        )

    def recon(self, batch: jax.Array, steps: int = 16):
        events = self.encode(batch, steps)
        recon = self.decode(events, batch.shape[0])
        return recon, events

    # ---- local <-> global event-tuple codec (reference :189-235) ----

    def to_unit_time(self, sample_position):
        return sample_position / self.size

    def to_sample_time(self, unit_time):
        return (unit_time * self.size).astype(jnp.int32)

    def to_global(self, events: SparseCodeResult, offset: int):
        """(atom_index, pos, value) -> (global_index, unit_time, amplitude).

        Amplitude is ``|value|`` (the norm of the scaled unit atom,
        reference ``to_amplitude`` ``:201``).
        """
        return (
            events.atom_indices + offset,
            self.to_unit_time(events.positions),
            jnp.abs(events.values),
        )

    def to_local(self, global_indices, unit_times, amplitudes, offset: int):
        """Inverse transform; the sign of the original value is lost (the
        reference has the same lossiness: amplitude is a norm)."""
        return SparseCodeResult(
            atom_indices=(global_indices - offset).astype(jnp.int32),
            positions=self.to_sample_time(unit_times),
            values=amplitudes,
            residual=None,
        )


class MultibandDictionaryLearning:
    """Decompose -> per-band code/learn -> recompose (reference
    ``multibanddict.py:282-473``)."""

    def __init__(self, specs: List[BandSpec], n_samples: int):
        self.bands: Dict[int, BandSpec] = {spec.size: spec for spec in specs}
        self.min_size = min(spec.size for spec in specs)
        self.n_samples = n_samples
        n_atoms = {spec.n_atoms for spec in specs}
        if len(n_atoms) > 1:
            raise ValueError("Only specs with equal atom counts is currently allowed")
        self.n_atoms = n_atoms.pop()

    def __len__(self):
        return len(self.bands)

    def event_count(self, iterations: int) -> int:
        return len(self) * iterations

    @property
    def total_atoms(self) -> int:
        return sum(v.n_atoms for v in self.bands.values())

    @property
    def band_dicts(self):
        return {size: band.d for size, band in self.bands.items()}

    @property
    def band_sizes(self):
        return list(self.bands.keys())

    def size_at_index(self, index: int) -> int:
        return list(self.bands.keys())[index]

    def index_of_size(self, band_size: int) -> int:
        return list(self.bands.keys()).index(band_size)

    def shape_dict(self, batch_size: int):
        return {size: band.shape(batch_size) for size, band in self.bands.items()}

    def get_band_from_global_atom_index(self, index: int):
        band_index = index // self.n_atoms
        return band_index, list(self.bands.values())[band_index]

    def atom_embeddings(self) -> jax.Array:
        return jnp.eye(self.total_atoms)

    def store(self, directory: str = "."):
        for band in self.bands.values():
            band.store(directory)

    def load(self, directory: str = "."):
        for band in self.bands.values():
            band.load(directory)

    def learn(self, batch: jax.Array, steps: int = 16):
        bands = _jit_decompose(batch, self.min_size)
        for size, band in bands.items():
            self.bands[size].learn(band, steps)

    def encode(self, batch: jax.Array, steps: int) -> Dict[int, SparseCodeResult]:
        bands = _jit_decompose(batch, self.min_size)
        return {
            size: band.encode(bands[size], steps)
            for size, band in self.bands.items()
        }

    def flattened_event_tuples(self, encoding: Dict[int, SparseCodeResult]):
        """All bands' events in the global (index, unit_time, amplitude)
        space, concatenated over bands (reference ``:410-422``)."""
        idxs, times, amps = [], [], []
        offset = 0
        for size, events in encoding.items():
            band = self.bands[size]
            gi, ut, amp = band.to_global(events, offset)
            idxs.append(gi.reshape(-1))
            times.append(ut.reshape(-1))
            amps.append(amp.reshape(-1))
            offset += band.n_atoms
        return (
            jnp.concatenate(idxs),
            jnp.concatenate(times),
            jnp.concatenate(amps),
        )

    def hierarchical_event_tuples(
        self, global_indices, unit_times, amplitudes
    ) -> Dict[int, SparseCodeResult]:
        """Inverse of ``flattened_event_tuples``: route each global event
        back to its band **by its global atom index** (reference
        ``get_band_from_global_atom_index``, ``multibanddict.py:424-443``)
        — so reordered, filtered, or model-generated event streams decode
        correctly, not just the canonical band-major layout.

        Each band receives the *full* event list with out-of-band events
        masked to amplitude 0 (they scatter nothing at decode time); this
        keeps every band's shapes static under jit."""
        out: Dict[int, SparseCodeResult] = {}
        offset = 0
        for size, band in self.bands.items():
            in_band = (global_indices >= offset) & (
                global_indices < offset + band.n_atoms
            )
            local_idx = jnp.where(in_band, global_indices - offset, 0)
            vals = jnp.where(in_band, amplitudes, 0.0)
            out[size] = SparseCodeResult(
                atom_indices=local_idx.astype(jnp.int32),
                positions=band.to_sample_time(unit_times),
                values=vals,
                residual=None,
            )
            offset += band.n_atoms
        return out

    def decode_global(
        self,
        global_indices,
        unit_times,
        amplitudes,
        batch_size: int,
        n_steps: int | None = None,
        batch_indices=None,
    ) -> jax.Array:
        """Decode straight from the global event-tuple representation
        (the codec's wire format). Events are routed per-event by global
        atom index, so the stream need not be in band-major order.

        Batch attribution: pass ``batch_indices`` (per-event batch row)
        for arbitrary streams; without it the canonical interleaving is
        assumed (event i belongs to batch row ``i % batch_size`` — the
        layout ``flattened_event_tuples`` emits), which stays correct
        under any permutation of a ``batch_size == 1`` stream but not of
        a batched one. ``n_steps`` accepted for compat and ignored."""
        n_events = int(global_indices.shape[0])
        if batch_indices is None:
            # canonical layout: event i belongs to batch row i % batch —
            # decode via a plain reshape (no batch_size x densify cost)
            pad = (-n_events) % batch_size
            if pad:
                global_indices = jnp.concatenate(
                    [global_indices, jnp.zeros((pad,), global_indices.dtype)]
                )
                unit_times = jnp.concatenate(
                    [unit_times, jnp.zeros((pad,), unit_times.dtype)]
                )
                amplitudes = jnp.concatenate(
                    [amplitudes, jnp.zeros((pad,), amplitudes.dtype)]
                )
            rows = (n_events + pad) // batch_size
            gi_m = global_indices.reshape(rows, batch_size)
            ut_m = unit_times.reshape(rows, batch_size)
            amp_m = amplitudes.reshape(rows, batch_size)
        else:
            # densify to (n_events, batch): each event contributes only to
            # its own batch row (amplitude masked elsewhere) — exact batch
            # routing for arbitrary streams with static shapes
            batch_indices = jnp.asarray(batch_indices, jnp.int32)
            mask = (
                batch_indices[:, None] == jnp.arange(batch_size)[None, :]
            )
            gi_m = jnp.broadcast_to(
                global_indices[:, None], (n_events, batch_size)
            )
            ut_m = jnp.broadcast_to(unit_times[:, None], (n_events, batch_size))
            amp_m = amplitudes[:, None] * mask
        rows = gi_m.shape[0]
        local = self.hierarchical_event_tuples(
            gi_m.reshape(-1), ut_m.reshape(-1), amp_m.reshape(-1)
        )
        output = {}
        for size, ev in local.items():
            output[size] = self.bands[size].decode(
                SparseCodeResult(
                    ev.atom_indices.reshape(rows, batch_size),
                    ev.positions.reshape(rows, batch_size),
                    ev.values.reshape(rows, batch_size),
                    None,
                ),
                batch_size,
            )
        return _jit_recompose(output, self.n_samples)

    def decode(
        self, encoding: Dict[int, SparseCodeResult], batch_size: int
    ) -> jax.Array:
        output = {
            size: self.bands[size].decode(events, batch_size)
            for size, events in encoding.items()
        }
        return _jit_recompose(output, self.n_samples)

    def recon(self, batch: jax.Array, steps: int = 16):
        encoding = self.encode(batch, steps)
        recon = self.decode(encoding, batch.shape[0])
        return recon, encoding
