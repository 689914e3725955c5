"""Fully-fused Pallas TPU kernel for one greedy fast-MP step.

The incremental-gram engine's scan step (fast_mp.py) is ~10 XLA ops per
step — block-table argmax, winning-block refine, residual surgery, a
gram-slice window subtract, the boundary-tail recompute, and two
block-max table repairs — each a separate HBM pass with its own
materialization. This kernel fuses the WHOLE step body into one
``pallas_call`` per scan iteration (grid over batch):

- the correlation map stays in HBM (``pl.ANY``); only the dynamic
  4-block window around the update (and the 2KB winning block) move
  through VMEM;
- Mosaic's vector loads/stores need 128-aligned lane offsets, so every
  dynamic-offset operation is expressed as a **circular roll**
  (``pltpu.roll`` lowers to the dynamic-rotate unit) of a zero-padded
  row plus a masked combine — no unaligned vector access anywhere;
- the boundary recompute builds the residual-tail Hankel matrix
  in-register with a log2(A) doubling ladder of static rolls + row
  masks (no gather), then one MXU matmul against the dictionary;
- all big operands are input/output aliased, so the surrounding
  ``lax.scan`` carries update in place.

Exact numerical parity with ``sparse_code_fast(block_argmax=True)`` —
same tie-breaking (first flat index), the winning value read from the
map itself — is enforced by tests/test_fast_mp.py.

Reference hot path being replaced: ``modules/conv.py:11-53`` +
``modules/matchingpursuit.py:269-328``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _roll(x: jax.Array, shift, interpret: bool) -> jax.Array:
    """Circular shift toward higher lane indices by ``shift`` (may be a
    traced scalar — lowers to the TPU dynamic-rotate unit)."""
    if interpret:
        return jnp.roll(x, shift, axis=-1)
    return pltpu.roll(x, shift, axis=x.ndim - 1)


def _first_max_2d(x: jax.Array):
    """(row, col, value) of the first maximum in row-major order —
    matches ``jnp.argmax`` of the flattened array."""
    rows, cols = x.shape
    m = jnp.max(x)
    flat_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * cols + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    )
    big = jnp.int32(rows * cols)
    fi = jnp.min(jnp.where(x == m, flat_ids, big))
    return fi // cols, fi % cols, m


def _step_kernel(
    # inputs
    fm_hbm,      # (B, N, W) ANY — correlation map
    gram_hbm,    # (N, N, 2A) ANY — dictionary auto-correlation, zero-padded
    res_hbm,     # (B, 1, L) ANY — padded residual rows, L = n_samples + A
    d2_ref,      # (N, A) VMEM — unit-norm dictionary
    bm_ref,      # (1, N, n_blocks) VMEM block — running block maxima
    # outputs
    fm_out,      # aliased fm
    res_out,     # aliased residual
    bm_out,      # aliased bm
    atom_out,    # (B, 1) SMEM int32
    pos_out,     # (B, 1) SMEM int32
    val_out,     # (B, 1) SMEM f32
    # scratch
    refine_scr,  # (8, block) VMEM — tiling-aligned slab around the winner
    res_scr,     # (1, L) VMEM
    gpad_scr,    # (N, upd_w) VMEM — gram row, zero-extended
    win_scr,     # (N, upd_w) VMEM
    hank_scr,    # (A, 2A) VMEM
    tail_scr,    # (N, A) VMEM
    sems,        # DMA semaphores (4,)
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    interpret: bool,
):
    b = pl.program_id(0)
    N = d2_ref.shape[0]
    A = atom_size
    L = n_samples + A
    upd_w = upd_blocks * block
    tail_blk = tail_start // block
    tail_nblk = A // block

    # ---- 1) argmax over the block-max table (first flat index wins)
    atom, blk, _ = _first_max_2d(bm_ref[0])

    # fetch the gram row + this item's residual while we refine
    gram_dma = pltpu.make_async_copy(
        gram_hbm.at[atom], gpad_scr.at[:, : 2 * A], sems.at[0]
    )
    gram_dma.start()
    res_dma = pltpu.make_async_copy(res_hbm.at[b], res_scr, sems.at[1])
    res_dma.start()

    # ---- 2) refine within the winning block. HBM sublane slices must be
    # tiling-aligned, so fetch an 8-row slab and mask out the winner.
    atom8 = (atom // 8) * 8
    refine_dma = pltpu.make_async_copy(
        fm_hbm.at[b, pl.ds(atom8, 8), pl.ds(blk * block, block)],
        refine_scr,
        sems.at[2],
    )
    refine_dma.start()
    refine_dma.wait()
    slab = refine_scr[:, :]  # (8, block)
    row_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (8, block), 0) == atom - atom8
    )
    NEG = jnp.float32(-3e38)
    seg2 = jnp.where(row_sel, slab, NEG)
    value = jnp.max(seg2)  # the refined winner IS the block max
    ids2 = jax.lax.broadcasted_iota(jnp.int32, (8, block), 1)
    li = jnp.min(jnp.where(seg2 == value, ids2, jnp.int32(block)))
    position = blk * block + li - pad

    # window around the update, clamped to the map
    ustart = position + pad - (A - 1)
    ws_blk = jnp.minimum(ustart // block, n_blocks - upd_blocks)
    ws = ws_blk * block
    win_dma = pltpu.make_async_copy(
        fm_hbm.at[b, :, pl.ds(ws, upd_w)], win_scr, sems.at[3]
    )
    win_dma.start()

    # ---- 3) residual surgery (clip semantics): rotate so the event
    # position sits at lane 0, subtract at a static offset, rotate back
    res_dma.wait()
    rot = _roll(res_scr[:, :], L - position, interpret)  # pos -> lane 0
    rot = jnp.concatenate(
        [rot[:, :A] - value * d2_ref[pl.ds(atom, 1), :], rot[:, A:]], axis=1
    )
    restored = _roll(rot, position, interpret)
    # zero everything past the signal end (static, 128-aligned)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    res_scr[:, :] = jnp.where(lane < n_samples, restored, 0.0)

    # ---- 4) boundary-tail recompute from the updated residual:
    # Hankel H[p, j] = t[p + j] built with a log2 roll ladder, then one
    # MXU matmul tail[a, p] = sum_k d2[a, k] * t[p + k]
    t = res_scr[:, n_samples - A :]  # (1, 2A), zeros past n included
    hank_scr[:, :] = jnp.broadcast_to(t, (A, 2 * A))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, 2 * A), 0)
    shift = 1
    while shift < A:
        rolled = _roll(hank_scr[:, :], 2 * A - shift, interpret)
        hank_scr[:, :] = jnp.where(
            (row_ids & shift) != 0, rolled, hank_scr[:, :]
        )
        shift *= 2
    tail_scr[:, :] = jax.lax.dot_general(
        d2_ref[:, :],
        hank_scr[:, :A],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, A) [atoms x tail positions]
    tail_fm = tail_scr[:, :]

    res_out_dma = pltpu.make_async_copy(res_scr, res_out.at[b], sems.at[1])
    res_out_dma.start()

    # ---- 5) gram-slice subtract into the window: place the gram row at
    # the (arbitrary) offset with a circular roll of its zero-padded
    # buffer — the single pad lane that can wrap is zero
    gram_dma.wait()
    win_dma.wait()
    gpad_scr[:, 2 * A :] = jnp.zeros(
        (N, upd_w - 2 * A), jnp.float32
    )
    off = ustart - ws
    placed = _roll(gpad_scr[:, :], off, interpret)
    win_scr[:, :] = win_scr[:, :] - value * placed

    # splice the exact tail into any window block it overlaps, so the
    # window block maxima match XLA's post-tail fix_blocks read
    for k in range(upd_blocks):
        for j in range(tail_nblk):

            @pl.when(ws_blk + k == tail_blk + j)
            def _(k=k, j=j):
                win_scr[:, k * block : (k + 1) * block] = tail_fm[
                    :, j * block : (j + 1) * block
                ]

    # ---- 6) write back: window first, then the tail region (the tail
    # is exact and must win where they overlap)
    win_out_dma = pltpu.make_async_copy(
        win_scr, fm_out.at[b, :, pl.ds(ws, upd_w)], sems.at[3]
    )
    win_out_dma.start()
    win_out_dma.wait()
    tail_out_dma = pltpu.make_async_copy(
        tail_scr, fm_out.at[b, :, pl.ds(tail_start, A)], sems.at[0]
    )
    tail_out_dma.start()

    # ---- 7) block-max maintenance: full-row masked writes (the table's
    # lane count is not 128-aligned, so dynamic placement goes through a
    # one-hot matmul instead of a rotate). Window maxima land at
    # [ws_blk, ws_blk+upd_blocks); the (static) tail blocks then take the
    # exact tail maxima via plain concatenation.
    wmax = jnp.max(win_scr[:, :].reshape(N, upd_blocks, block), axis=-1)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, n_blocks), 1)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, n_blocks), 0)
    placer = (lane_b == ws_blk + row_k).astype(jnp.float32)
    wplaced = jax.lax.dot_general(
        wmax,
        placer,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, n_blocks): wmax[k] at lane ws_blk + k, zeros elsewhere
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (N, n_blocks), 1)
    in_win = (lane_n >= ws_blk) & (lane_n < ws_blk + upd_blocks)
    new_bm = jnp.where(in_win, wplaced, bm_ref[0])

    tmax = jnp.max(tail_fm.reshape(N, tail_nblk, block), axis=-1)
    tplaced = jnp.concatenate(
        [
            jnp.zeros((N, tail_blk), jnp.float32),
            tmax,
            jnp.zeros((N, n_blocks - tail_blk - tail_nblk), jnp.float32),
        ],
        axis=1,
    )
    in_tail = (lane_n >= tail_blk) & (lane_n < tail_blk + tail_nblk)
    bm_out[0] = jnp.where(in_tail, tplaced, new_bm)

    res_out_dma.wait()
    tail_out_dma.wait()

    atom_out[b, 0] = atom
    pos_out[b, 0] = position
    val_out[b, 0] = value


@partial(
    jax.jit,
    static_argnames=(
        "n_samples",
        "atom_size",
        "block",
        "pad",
        "n_blocks",
        "upd_blocks",
        "tail_start",
        "interpret",
    ),
)
def pallas_fused_step(
    fm: jax.Array,        # (B, N, W)
    bm: jax.Array,        # (B, N, n_blocks)
    residual: jax.Array,  # (B, n_samples + A)
    d2: jax.Array,        # (N, A)
    gram: jax.Array,      # (N, N, 2A) — zero-padded last lag
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    interpret: bool = False,
):
    """One fused greedy step for every batch item. Returns
    (fm, bm, residual, atom_indices (B,), positions (B,), values (B,))."""
    B, N, W = fm.shape
    A = atom_size
    upd_w = upd_blocks * block
    L = n_samples + A
    # (B, 1, L): leading-dim indexing keeps HBM DMA slices tiling-aligned
    res3 = residual.reshape(B, 1, L)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm
        pl.BlockSpec(memory_space=pl.ANY),  # gram
        pl.BlockSpec(memory_space=pl.ANY),  # residual
        pl.BlockSpec((N, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, N, n_blocks), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (1, N, n_blocks), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]

    kernel = partial(
        _step_kernel,
        n_samples=n_samples,
        atom_size=A,
        block=block,
        pad=pad,
        n_blocks=n_blocks,
        upd_blocks=upd_blocks,
        tail_start=tail_start,
        interpret=interpret,
    )

    fm2, res2, bm2, atom, pos, val = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(fm.shape, fm.dtype),
            jax.ShapeDtypeStruct(res3.shape, res3.dtype),
            jax.ShapeDtypeStruct(bm.shape, bm.dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, block), jnp.float32),
            pltpu.VMEM((1, L), jnp.float32),
            pltpu.VMEM((N, upd_w), jnp.float32),
            pltpu.VMEM((N, upd_w), jnp.float32),
            pltpu.VMEM((A, 2 * A), jnp.float32),
            pltpu.VMEM((N, A), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={0: 0, 2: 1, 4: 2},
        interpret=interpret,
        compiler_params=(
            pltpu.CompilerParams(has_side_effects=True)
            if not interpret and PALLAS_AVAILABLE
            else None
        ),
    )(fm, gram, res3, d2, bm)
    return fm2, bm2, res2.reshape(B, L), atom[:, 0], pos[:, 0], val[:, 0]


def fused_step_applicable(
    n_samples: int, atom_size: int, block: int, pad: int, n_atoms: int
) -> bool:
    """Static applicability: Mosaic vector/DMA lane offsets must be
    provably 128-aligned and the roll ladder needs power-of-two tails —
    satisfied by the power-of-two benchmark shapes."""
    if not PALLAS_AVAILABLE:
        return False
    tail_start = pad + n_samples - atom_size
    upd_blocks = (2 * atom_size - 1 + block - 1) // block + 1
    return (
        atom_size % block == 0
        and atom_size % 128 == 0
        and block % 128 == 0
        and n_samples % 128 == 0
        and tail_start % block == 0
        and (atom_size & (atom_size - 1)) == 0  # power of two (roll ladder)
        and n_atoms % 8 == 0
        and upd_blocks * block >= 2 * atom_size  # gram row + zero pad fit
    )
