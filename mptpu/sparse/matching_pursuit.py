"""Greedy matching pursuit + dictionary learning, TPU-native.

Capability parity with reference ``modules/matchingpursuit.py``
(``sparse_code`` ``:229-345``, ``dictionary_learning_step`` ``:348-419``,
``sparse_feature_map`` ``:68-125``, ``sparse_coding_loss`` ``:128-146``),
re-designed for XLA:

- The greedy loop is a ``lax.scan`` over steps; the carry is the residual.
  Each step runs one fused correlate -> argmax(atom, shift) ->
  dynamic-slice subtract. No per-batch-item python loops — selection and
  residual surgery are batched with ``vmap``.
- The correlation is the MXU conv kernel (``mptpu.ops.mp_correlate``) or
  its rFFT variants (``approx=`` slice / top-k frequency approximation).
- Events come back as dense arrays ``(n_steps, batch)`` of
  (atom_index, position, value) instead of python dicts — the natural SoA
  layout for jit, and what the dictionary-update scatter/gathers consume.
- Boundary-clipped atoms follow the reference's pad-3x-and-trim semantics:
  energy scattered past the signal end is dropped, gathers past the end
  read zeros.

The dictionary update preserves the reference's *sequential-over-atoms*
Gauss-Seidel structure (later atoms see earlier atoms' updates) as a
``lax.fori_loop`` visiting atoms in first-selection order (the
reference's dict-insertion order), with each atom's instance set
processed as one masked scatter/gather over all events.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.correlation import mp_correlate
from ..ops.norms import unit_norm


class SparseCodeResult(NamedTuple):
    """Struct-of-arrays event list: step-major, one event per batch item
    per step (the jit-friendly analog of the reference's
    ``{atom_index: [(ai, batch, pos, scaled_atom), ...]}`` dicts)."""

    atom_indices: jax.Array  # (n_steps, batch) int32
    positions: jax.Array     # (n_steps, batch) int32
    values: jax.Array        # (n_steps, batch) float32
    residual: jax.Array      # (batch, channels, n_samples)


def _normalize_dict(d: jax.Array) -> jax.Array:
    """Unit-norm each atom over all non-leading dims
    (reference ``matchingpursuit.py:254``)."""
    flat = d.reshape(d.shape[0], -1)
    return unit_norm(flat).reshape(d.shape)


def _as3d(d: jax.Array) -> jax.Array:
    return d if d.ndim == 3 else d[:, None, :]


def _subtract_event(residual, atom, pos, value, atom_size):
    """Subtract ``value * atom`` from one (channels, n_samples) residual at
    ``pos``, clipping anything past the end (pad + dynamic update + trim)."""
    channels, n_samples = residual.shape
    padded = jnp.pad(residual, ((0, 0), (0, atom_size)))
    seg = lax.dynamic_slice(padded, (0, pos), (channels, atom_size))
    padded = lax.dynamic_update_slice(padded, seg - value * atom, (0, pos))
    return padded[:, :n_samples]


def sparse_code(
    signal: jax.Array,
    d: jax.Array,
    n_steps: int = 100,
    approx=None,
    use_fft: bool = False,
) -> SparseCodeResult:
    """Greedy sparse coding: ``n_steps`` rounds of correlate / pick the
    single best (atom, shift) per batch item / subtract.

    signal: (batch, channels, n_samples) or (batch, n_samples)
    d: (n_atoms, atom_size) or (n_atoms, channels, atom_size) — unit-normed
    internally.
    """
    if signal.ndim == 2:
        signal = signal[:, None, :]
    batch, channels, n_samples = signal.shape
    d3 = _as3d(d)
    n_atoms, _, atom_size = d3.shape
    d3 = _normalize_dict(d3)

    def step(residual, _):
        fm = mp_correlate(residual, d3, approx=approx, use_fft=use_fft)
        flat = fm.reshape(batch, -1)
        idx = jnp.argmax(flat, axis=-1)
        value = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]
        atom_index = (idx // n_samples).astype(jnp.int32)
        position = (idx % n_samples).astype(jnp.int32)
        new_residual = jax.vmap(
            lambda r, ai, p, v: _subtract_event(r, d3[ai], p, v, atom_size)
        )(residual, atom_index, position, value)
        return new_residual, (atom_index, position, value)

    residual, (atom_indices, positions, values) = lax.scan(
        step, signal, None, length=n_steps
    )
    return SparseCodeResult(atom_indices, positions, values, residual)


def scatter_events(
    atom_indices: jax.Array,
    positions: jax.Array,
    values: jax.Array,
    d: jax.Array,
    n_samples: int,
    channels: int = 1,
    batch: int | None = None,
) -> jax.Array:
    """Render an event list back to a signal: sum value * atom at each
    position, dropping energy past the signal end (reference
    ``build_scatter_segments``, ``matchingpursuit.py:20-58``)."""
    d3 = _as3d(d)
    n_atoms, _, atom_size = d3.shape
    S, B = atom_indices.shape
    if batch is None:
        batch = B
    contrib = values[..., None, None] * d3[atom_indices]  # (S, B, C, A)
    padded = jnp.zeros((batch, channels, n_samples + atom_size), contrib.dtype)
    window = positions[..., None] + jnp.arange(atom_size)  # (S, B, A)
    b_idx = jnp.broadcast_to(jnp.arange(B)[None, :, None], window.shape)
    # scatter-add every event's window; channel loop is tiny and static
    for c in range(channels):
        padded = padded.at[b_idx, c, window].add(contrib[:, :, c, :])
    return padded[..., :n_samples]


def reconstruct_from_events(result: SparseCodeResult, d: jax.Array) -> jax.Array:
    batch, channels, n_samples = result.residual.shape
    return scatter_events(
        result.atom_indices,
        result.positions,
        result.values,
        _normalize_dict(_as3d(d)),
        n_samples,
        channels=channels,
        batch=batch,
    )


def dictionary_learning_step(
    signal: jax.Array,
    d: jax.Array,
    n_steps: int = 100,
    approx=None,
    use_fft: bool = False,
) -> jax.Array:
    """One dictionary-learning sweep (reference
    ``matchingpursuit.py:348-419``):

    sparse-code the signal, then for each atom in sequence: add its
    instances into the update residual, gather the residual segments at
    the instance positions, average + unit-norm them into the new atom,
    and re-subtract the instances rendered with the new atom (amplitude
    ``|value|``). CRITICAL parity detail: the update pass starts from the
    FULL signal (reference resets ``residual = signal.clone()`` at
    ``matchingpursuit.py:367``), NOT from the coding residual — so when
    atom k is updated, the contributions of not-yet-visited atoms are
    still present in what it gathers (measured: starting from the coding
    residual instead loses a systematic ~1.3 dB/trajectory at the
    multiband benchmark config; see trained_weights/multiband_parity.json).
    Later atoms see earlier atoms' updates (Gauss-Seidel), exactly like
    the reference's python loop — here a ``lax.fori_loop`` whose body
    does masked batched scatter/gathers over all events at once. Atoms are visited in first-selection order (the reference
    iterates its event dict, whose keys are inserted at first selection,
    ``matchingpursuit.py:391``); unused atoms are no-ops. Energy scattered
    past the signal end is dropped (the pad region is re-zeroed after each
    scatter) so gathers past the end read zeros, matching the reference's
    3x-pad-and-trim semantics.
    """
    if signal.ndim == 2:
        signal = signal[:, None, :]
    batch, channels, n_samples = signal.shape
    d3 = _normalize_dict(_as3d(d))
    n_atoms, _, atom_size = d3.shape

    if approx is None and not use_fft and channels == 1:
        # numerically identical fast path (see fast_mp.py); on TPU the
        # fused kernel engages when shapes pass its gate, else block_argmax
        from .fast_mp import sparse_code_fast

        atom_sz = d3.shape[-1]
        block = min(512, atom_sz) if atom_sz >= 128 else 512
        coded = sparse_code_fast(
            signal,
            d3[:, 0, :],
            n_steps=n_steps,
            block=block,
            fused=jax.default_backend() != "cpu",
            block_argmax=jax.default_backend() != "cpu",
        )
    else:
        coded = sparse_code(
            signal, d3, n_steps=n_steps, approx=approx, use_fft=use_fft
        )
    ai, pos, val = coded.atom_indices, coded.positions, coded.values  # (S, B)

    # padded update residual: starts from the FULL signal (see docstring);
    # events may spill past the end; the pad region mimics the reference's
    # 3x-pad trick for both scatter (dropped on trim) and gather (reads
    # zeros)
    padded0 = jnp.pad(signal, ((0, 0), (0, 0), (0, atom_size)))

    window = pos[..., None] + jnp.arange(atom_size)        # (S, B, A)
    b_idx = jnp.broadcast_to(
        jnp.arange(batch)[None, :, None], window.shape
    )

    # visit atoms in first-selection order: the reference iterates its
    # event dict, whose keys are inserted at first selection (step-major,
    # batch-minor). Unused atoms sort last (ties by index) and are no-ops.
    S, B = ai.shape
    sel_rank = jnp.arange(S * B, dtype=jnp.int32).reshape(S, B)
    first_sel = jnp.full((n_atoms,), S * B, dtype=jnp.int32)
    first_sel = first_sel.at[ai.reshape(-1)].min(sel_rank.reshape(-1))
    atom_order = jnp.argsort(first_sel).astype(jnp.int32)

    def update_one_atom(i, carry):
        padded, dd = carry
        a = atom_order[i]
        mask = (ai == a).astype(padded.dtype)              # (S, B)
        old_atom = dd[a]                                   # (C, A)

        # 1) add instances (rendered with the *coding-time* atom) back;
        # energy past the signal end is dropped (reference trims its 3x pad)
        add_back = (mask * val)[..., None, None] * old_atom  # (S, B, C, A)
        for c in range(channels):
            padded = padded.at[b_idx, c, window].add(add_back[:, :, c, :])
        padded = padded.at[:, :, n_samples:].set(0.0)

        # 2) gather residual segments at instance positions, sum
        gathered = padded[b_idx, :, window]                # (S, B, A, C)
        gathered = jnp.moveaxis(gathered, -1, -2)          # (S, B, C, A)
        summed = jnp.sum(
            gathered * mask[..., None, None], axis=(0, 1)
        )                                                  # (C, A)
        used = jnp.sum(mask) > 0
        new_atom = unit_norm(summed.reshape(-1)).reshape(channels, atom_size)
        new_atom = jnp.where(used, new_atom, old_atom)
        dd = dd.at[a].set(new_atom)

        # 3) re-subtract instances rendered with the new atom at |value|
        re_sub = (mask * jnp.abs(val))[..., None, None] * new_atom
        for c in range(channels):
            padded = padded.at[b_idx, c, window].add(-re_sub[:, :, c, :])
        padded = padded.at[:, :, n_samples:].set(0.0)

        return padded, dd

    _, d_new = lax.fori_loop(0, n_atoms, update_one_atom, (padded0, d3))
    d_new = _normalize_dict(d_new)
    return d_new if d.ndim == 3 else d_new[:, 0, :]


def sparse_feature_map(
    signal: jax.Array,
    d: jax.Array,
    n_steps: int = 100,
    approx=None,
    use_fft: bool = False,
    return_residual: bool = False,
):
    """Dense (batch, n_atoms, n_samples) map of greedy-MP activations,
    differentiable in the selected values (straight-through positions) —
    reference ``matchingpursuit.py:68-125``."""
    if signal.ndim == 2:
        signal = signal[:, None, :]
    batch, channels, n_samples = signal.shape
    d3 = _normalize_dict(_as3d(d))
    n_atoms, _, atom_size = d3.shape

    fm0 = jnp.zeros((batch, n_atoms, n_samples), signal.dtype)

    def step(carry, _):
        residual, fm = carry
        f = mp_correlate(residual, d3, approx=approx, use_fft=use_fft)
        flat = f.reshape(batch, -1)
        idx = jnp.argmax(flat, axis=-1)
        value = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]
        atom_index = (idx // n_samples).astype(jnp.int32)
        position = (idx % n_samples).astype(jnp.int32)
        fm = fm.at[jnp.arange(batch), atom_index, position].add(value)
        residual = jax.vmap(
            lambda r, a, p, v: _subtract_event(r, d3[a], p, v, atom_size)
        )(residual, atom_index, position, value)
        return (residual, fm), None

    (residual, fm), _ = lax.scan(step, (signal, fm0), None, length=n_steps)
    if return_residual:
        return fm, residual
    return fm


def sparse_coding_loss(
    recon: jax.Array,
    target: jax.Array,
    d: jax.Array,
    n_steps: int = 100,
    approx=None,
) -> jax.Array:
    """BCE between max-normalized greedy feature maps of reconstruction and
    target (target map is stop-gradient) — reference
    ``matchingpursuit.py:128-146``."""
    r_map = sparse_feature_map(recon, d, n_steps=n_steps, approx=approx)
    t_map = lax.stop_gradient(
        sparse_feature_map(target, d, n_steps=n_steps, approx=approx)
    )
    mx = jnp.maximum(jnp.max(r_map), jnp.max(t_map))
    r = jnp.clip(r_map / mx, 1e-7, 1.0 - 1e-7)
    t = jnp.clip(t_map / mx, 0.0, 1.0)
    bce = -(t * jnp.log(r) + (1.0 - t) * jnp.log(1.0 - r))
    return jnp.mean(bce)


def flatten_atom_dict(atom_dict) -> list:
    """Flatten a {key: [events...]} mapping into one event list (reference
    ``matchingpursuit.py:61-65``)."""
    all_instances = []
    for v in atom_dict.values():
        all_instances.extend(v)
    return all_instances


class SparseCodingLoss:
    """Stateful sparse-coding BCE loss: learns its own dictionary from the
    targets for the first ``learning_steps`` calls, then scores
    reconstructions against targets in greedy-feature-map space
    (reference ``matchingpursuit.py:422-462``).

    The dictionary lives as a host-side attribute (the reference keeps a
    non-parameter buffer); the learning step and the loss are jitted."""

    def __init__(
        self,
        n_atoms: int,
        atom_size: int,
        n_steps: int,
        approx=None,
        learning_steps: int = 16,
        seed: int = 0,
    ):
        self.approx = approx
        self.n_steps = n_steps
        self.learning_steps = learning_steps
        self._steps_executed = 0
        key = jax.random.PRNGKey(seed)
        d = jax.random.uniform(
            key, (n_atoms, atom_size), minval=-1.0, maxval=1.0
        )
        self.d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)

    def _learning_step(self, signal: jax.Array) -> None:
        self.d = jax.jit(
            dictionary_learning_step, static_argnames=("n_steps", "approx")
        )(signal, self.d, n_steps=self.n_steps, approx=self.approx)
        self._steps_executed += 1

    def loss(self, recon: jax.Array, target: jax.Array) -> jax.Array:
        if self._steps_executed < self.learning_steps:
            self._learning_step(lax.stop_gradient(target))
        return sparse_coding_loss(
            recon, target, self.d, n_steps=self.n_steps, approx=self.approx
        )

    __call__ = loss


class AtomPlacement:
    """Scatter ``n_events`` rendered atoms at frame indices * step_size
    (reference ``modules/sparse.py:274-296``, a TorchScript double loop —
    here one vmapped ``dynamic_update_slice`` add into a 2x buffer)."""

    def __init__(self, n_samples: int, n_events: int, step_size: int):
        self.n_samples = n_samples
        self.n_events = n_events
        self.step_size = step_size

    def render(self, x: jax.Array, indices: jax.Array) -> jax.Array:
        n_samples, n_events = self.n_samples, self.n_events
        x = x.reshape(-1, n_events, n_samples)
        times = indices.reshape(-1, n_events) * self.step_size

        def place_one(out, ev, t):
            seg = lax.dynamic_slice(out, (t,), (n_samples,))
            return lax.dynamic_update_slice(out, seg + ev, (t,))

        def place_all(evs, ts):
            out = jnp.zeros((n_samples * 2,), x.dtype)
            out, _ = lax.scan(
                lambda o, et: (place_one(o, et[0], et[1].astype(jnp.int32)), None),
                out,
                (evs, ts),
            )
            return out

        out = jax.vmap(place_all)(x, times)
        return out[:, None, :n_samples]

    __call__ = render
