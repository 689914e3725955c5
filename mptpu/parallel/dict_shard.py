"""Dictionary-sharded (atom-parallel) matching pursuit.

The one genuine collective this workload needs (SURVEY.md §2.6): shard the
atom dictionary across the 'dict' mesh axis; each chip correlates the
replicated residual against its shard, takes a local argmax, and the
global (value, atom, shift) winner is resolved with an all-gather of the
per-shard triples; the winning atom is broadcast by a psum of a
owner-masked contribution so every chip applies the same subtraction.

Built with ``shard_map`` so the collectives are explicit and ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.correlation import mp_correlate
from ..ops.norms import unit_norm
from ..sparse.matching_pursuit import SparseCodeResult, _subtract_event


def sharded_mp_correlate(mesh: Mesh, signal, atoms, axis: str = "dict"):
    """Correlation with the dictionary sharded over ``axis``; output
    feature map is sharded over its atom dimension."""

    def local(signal, atoms_shard):
        return mp_correlate(signal, atoms_shard)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(None, axis, None),
    )(signal, atoms)


def sharded_sparse_code(
    mesh: Mesh,
    signal: jax.Array,
    d: jax.Array,
    n_steps: int = 100,
    axis: str = "dict",
    data_axis: Optional[str] = None,
) -> SparseCodeResult:
    """Greedy MP with the dictionary sharded across ``axis``, and
    (optionally) the batch sharded across ``data_axis`` — the 2-D
    batch x dictionary mesh mode.

    signal: (batch, channels, n_samples) — replicated over 'dict',
            sharded over ``data_axis`` when given
    d: (n_atoms, atom_size) — sharded on atoms (n_atoms % n_devices == 0)
    Numerically identical to ``sparse_code`` (same greedy argmax; ties
    break toward the lower global atom index). Collectives: per step one
    all_gather of (value, atom, pos) triples + one masked psum of the
    winning atom, both over the 'dict' axis only — batch rows never
    communicate, so the 'data' axis adds zero ICI traffic.
    """
    if signal.ndim == 2:
        signal = signal[:, None, :]
    batch, channels, n_samples = signal.shape
    n_atoms, atom_size = d.shape[0], d.shape[-1]
    d = unit_norm(d.reshape(n_atoms, -1)).reshape(d.shape)
    d3 = d if d.ndim == 3 else d[:, None, :]

    n_dev = mesh.shape[axis]
    if n_atoms % n_dev != 0:
        raise ValueError(
            f"sharded_sparse_code: n_atoms ({n_atoms}) must be divisible "
            f"by the '{axis}' axis size ({n_dev}); pad the dictionary or "
            "choose a divisor mesh."
        )
    shard_atoms = n_atoms // n_dev
    if data_axis is not None:
        n_data = mesh.shape[data_axis]
        if batch % n_data != 0:
            raise ValueError(
                f"sharded_sparse_code: batch ({batch}) must be divisible "
                f"by the '{data_axis}' axis size ({n_data})."
            )

    def body(signal, d_shard):
        # runs per-device: signal (B_local, C, n), d_shard (shard_atoms, C, A)
        my_index = lax.axis_index(axis)
        b_local = signal.shape[0]

        def step(residual, _):
            fm = mp_correlate(residual, d_shard)  # (B_local, shard_atoms, n)
            flat = fm.reshape(b_local, -1)
            local_idx = jnp.argmax(flat, axis=-1)
            local_val = jnp.take_along_axis(flat, local_idx[:, None], -1)[:, 0]
            local_atom = local_idx // n_samples
            local_pos = local_idx % n_samples

            # gather every dict-shard's (value, atom, pos) triple
            vals = lax.all_gather(local_val, axis)       # (n_dev, B_local)
            atoms_g = lax.all_gather(local_atom, axis)   # (n_dev, B_local)
            pos_g = lax.all_gather(local_pos, axis)      # (n_dev, B_local)

            winner = jnp.argmax(vals, axis=0)            # (B_local,)
            b_idx = jnp.arange(b_local)
            win_val = vals[winner, b_idx]
            win_local_atom = atoms_g[winner, b_idx]
            win_pos = pos_g[winner, b_idx]
            win_global_atom = winner * shard_atoms + win_local_atom

            # owner broadcasts the winning atom via masked psum
            is_owner = (winner == my_index).astype(signal.dtype)
            local_contrib = d_shard[win_local_atom]  # (B_local, C, A)
            contrib = lax.psum(
                local_contrib * is_owner[:, None, None], axis
            )

            new_residual = jax.vmap(
                lambda r, a, p, v: _subtract_event(r, a, p, v, atom_size)
            )(residual, contrib, win_pos, win_val)
            return new_residual, (
                win_global_atom.astype(jnp.int32),
                win_pos.astype(jnp.int32),
                win_val,
            )

        # the residual becomes device-varying after the first masked-psum
        # subtraction; mark the initial carry accordingly (shard_map vma)
        init = lax.pcast(signal, (axis,), to="varying")
        residual, events = lax.scan(step, init, None, length=n_steps)
        # every dict shard holds an identical residual (same winners
        # applied), but the carry is typed device-varying — a pmax is an
        # identity that re-establishes replication along 'dict'
        residual = lax.pmax(residual, axis)
        events = jax.tree_util.tree_map(
            lambda e: lax.pmax(e, axis), events
        )
        return residual, events

    dp = data_axis  # None -> replicated batch
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(dp), P(axis)),
        out_specs=(P(dp), (P(None, dp), P(None, dp), P(None, dp))),
    )
    residual, (atom_indices, positions, values) = fn(signal, d3)
    return SparseCodeResult(atom_indices, positions, values, residual)
