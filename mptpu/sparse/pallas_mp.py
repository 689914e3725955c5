"""Pallas TPU kernel for the fast-MP boundary recompute.

Every greedy step ends by exactly recomputing the last ``atom_size``
correlation-map positions (the region where the clipped-atom gram update
is wrong — see fast_mp.py). As XLA ops this is three HBM passes over the
tail region: an einsum producing ``tail_fm``, a ``dynamic_update_slice``
writing it into the map, and a re-read for the block-max refresh. This
kernel fuses them: one MXU matmul per (batch, atom-tile) grid cell whose
result is written into the aliased map buffer and max-reduced in-register.

The block maxima come out as a small standalone ``(batch, n_atoms,
atom_size // block)`` array rather than an aliased write into the full
block-max table — Mosaic requires block last-dims to be 128-divisible or
whole-array, and the tail only spans a handful of blocks; splicing the
tiny result into the table is a free XLA op.

All indices are static (the tail position is fixed by the signal length),
so plain ``BlockSpec`` index maps suffice — no scalar prefetch needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _tail_kernel(windows_ref, atoms_ref, fm_in_ref, fm_ref, tmax_ref, *, block: int):
    """windows (1, A, A) x atoms^T (A, atoms_tile) -> tail (atoms_tile, A),
    written into fm and max-reduced into tmax.

    fm block: (1, atoms_tile, A); tmax block: (1, atoms_tile, A // block).
    """
    windows = windows_ref[0]          # (A, A) [positions x taps]
    atoms = atoms_ref[:]              # (atoms_tile, A) [atoms x taps]
    # tail[n, t] = sum_k windows[t, k] * atoms[n, k]
    tail = jax.lax.dot_general(
        atoms,
        windows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # (atoms_tile, A)
    fm_ref[0] = tail
    atoms_tile, a = tail.shape
    tmax_ref[0] = jnp.max(tail.reshape(atoms_tile, a // block, block), axis=-1)


@partial(jax.jit, static_argnames=("tail_start", "block", "atoms_tile"))
def pallas_boundary_update(
    fm: jax.Array,       # (batch, n_atoms, W)
    bm: jax.Array,       # (batch, n_atoms, n_blocks)
    windows: jax.Array,  # (batch, A, A) residual tail windows
    d: jax.Array,        # (n_atoms, A) unit-norm dictionary
    tail_start: int,     # element offset of the tail region in fm
    block: int,
    atoms_tile: int = 256,
):
    """Fused tail recompute: returns (fm, bm) with the last A positions
    of the map (and their block maxima) replaced by exact correlations.

    Requires ``tail_start % atom_size == 0`` so the tail region is a whole
    BlockSpec block of the map (true whenever the padded map width is a
    multiple of the atom size — the power-of-two benchmark configs)."""
    batch, n_atoms, W = fm.shape
    atom_size = d.shape[-1]
    assert tail_start % block == 0 and atom_size % block == 0
    assert tail_start % atom_size == 0, "tail must be block-aligned in fm"
    n_tiles = max(1, n_atoms // atoms_tile)
    atoms_tile = n_atoms // n_tiles
    tail_nblk = atom_size // block

    grid_spec = pl.GridSpec(
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, atom_size, atom_size),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (atoms_tile, atom_size),
                lambda b, t: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            # aliased map buffer: same block mapping as its output
            pl.BlockSpec(
                (1, atoms_tile, atom_size),
                lambda b, t: (b, t, tail_start // atom_size),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, atoms_tile, atom_size),
                lambda b, t: (b, t, tail_start // atom_size),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, atoms_tile, tail_nblk),
                lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )

    new_fm, tail_max = pl.pallas_call(
        partial(_tail_kernel, block=block),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(fm.shape, fm.dtype),
            jax.ShapeDtypeStruct((batch, n_atoms, tail_nblk), fm.dtype),
        ],
        input_output_aliases={2: 0},
        # Mosaic only lowers on TPU; interpret on CPU so the same code
        # path is testable on the 8-device virtual mesh
        interpret=jax.default_backend() == "cpu",
    )(windows, d, fm)
    new_bm = jax.lax.dynamic_update_slice(
        bm, tail_max, (0, 0, tail_start // block)
    )
    return new_fm, new_bm
