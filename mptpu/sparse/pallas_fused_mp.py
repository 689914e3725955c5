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
    gate_tail: bool,
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

    # ---- 4) boundary-tail recompute from the updated residual —
    # needed ONLY when the event actually clipped (the zeroing above
    # changed lanes >= n_samples, i.e. position > n_samples - A; the map
    # has no negative positions — the left pad is argmax-poisoned). For
    # interior events the gram-slice subtract is EXACT at every map
    # position including the tail, so the Hankel ladder + MXU matmul +
    # tail write-back (~half the per-step compute) are skipped.
    # Hankel H[p, j] = t[p + j] built with a log2 roll ladder, then one
    # MXU matmul tail[a, p] = sum_k d2[a, k] * t[p + k]
    clipped = (position > n_samples - A) if gate_tail else (position < 2**30)

    @pl.when(clipped)
    def _():
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

            @pl.when(clipped & (ws_blk + k == tail_blk + j))
            def _(k=k, j=j):
                win_scr[:, k * block : (k + 1) * block] = tail_scr[
                    :, j * block : (j + 1) * block
                ]

    # ---- 6) write back: window first, then the tail region (the tail
    # is exact and must win where they overlap)
    win_out_dma = pltpu.make_async_copy(
        win_scr, fm_out.at[b, :, pl.ds(ws, upd_w)], sems.at[3]
    )
    win_out_dma.start()
    win_out_dma.wait()

    @pl.when(clipped)
    def _():
        tail_out_dma = pltpu.make_async_copy(
            tail_scr, fm_out.at[b, :, pl.ds(tail_start, A)], sems.at[0]
        )
        tail_out_dma.start()
        tail_out_dma.wait()

    # ---- 7) block-max maintenance: full-row masked writes (the table's
    # lane count is not 128-aligned, so dynamic placement goes through a
    # one-hot matmul instead of a rotate). Window maxima land at
    # [ws_blk, ws_blk+upd_blocks); on clipped steps the (static) tail
    # blocks then take the exact tail maxima via plain concatenation.
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
    bm_out[0] = jnp.where(in_win, wplaced, bm_ref[0])

    @pl.when(clipped)
    def _():
        tmax = jnp.max(tail_scr[:, :].reshape(N, tail_nblk, block), axis=-1)
        tplaced = jnp.concatenate(
            [
                jnp.zeros((N, tail_blk), jnp.float32),
                tmax,
                jnp.zeros((N, n_blocks - tail_blk - tail_nblk), jnp.float32),
            ],
            axis=1,
        )
        in_tail = (lane_n >= tail_blk) & (lane_n < tail_blk + tail_nblk)
        bm_out[0] = jnp.where(in_tail, tplaced, bm_out[0])

    res_out_dma.wait()

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
        "gate_tail",
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
    gate_tail: bool = True,
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
        gate_tail=gate_tail,
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


def _pipelined_step_kernel(
    # inputs
    fm_hbm,      # (B, N, W) ANY
    gram_hbm,    # (N, N, 2A) ANY
    res_hbm,     # (B, 1, L) ANY
    bm_hbm,      # (B, N, n_blocks) ANY
    d2_ref,      # (N, A) VMEM
    # outputs
    fm_out,      # aliased fm
    res_out,     # aliased residual
    bm_out,      # aliased bm
    atom_out,    # (B, 1) SMEM
    pos_out,
    val_out,
    # scratch (slot-alternating where a DMA may still be in flight)
    bm_scr,      # (2, N, n_blocks) VMEM
    refine_scr,  # (8, block) VMEM
    res_scr,     # (2, 1, L) VMEM
    gpad_scr,    # (N, upd_w) VMEM (single: produced by prefetch, consumed
                 #  by the next heavy phase, never concurrently owned)
    win_scr,     # (2, N, upd_w) VMEM
    hank_scr,    # (A, 2A) VMEM (compute-only)
    tail_scr,    # (2, N, A) VMEM
    pend_i,      # (2, 5) SMEM int32: atom, position, ws_blk, item, clipped
    pend_f,      # (2, 1) SMEM f32: value
    sems,        # DMA semaphores (2, 9):
                 #  0 bm_in, 1 refine, 2 gram, 3 res_in, 4 win_in,
                 #  5 res_out, 6 win_out, 7 tail_out, 8 bm_out
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    n_items: int,
    gate_tail: bool,
    interpret: bool,
    ablate: frozenset = frozenset(),
):
    """Cross-item software-pipelined variant of ``_step_kernel``.

    Items are fully independent, so while item g's heavy phase (residual
    surgery, Hankel/MXU tail, window subtract, write-backs) runs, item
    g+1's LIGHT phase (block-table argmax -> winner refine -> launch its
    gram/residual/window fetches) has already put every data-dependent
    DMA in flight — hiding the serial DMA latency chain that dominates
    the non-pipelined kernel (~40 us per (item, step) vs the ~12 us HBM
    bound, BENCHMARKS.md).

    ``ablate`` (compile-time, perf-measurement only — numerics are WRONG
    under any non-empty set) skips named phases so their cost can be
    measured by difference on real hardware: "argmax" (bm fetch + table
    argmax + winner refine), "gram" (gram-row fetch), "res" (residual
    DMA + surgery + boundary-tail recompute), "winvpu" (the window
    place-roll + subtract), "windma" (window fetch + write-back),
    "bmm" (block-max maintenance VPU), "gpadzero1" (zero the gram pad
    region only on the first grid step — an exactness-preserving
    optimization candidate: the region is rewritten identically every
    step).
    """
    g = pl.program_id(0)
    N = d2_ref.shape[0]
    A = atom_size
    L = n_samples + A
    upd_w = upd_blocks * block
    tail_blk = tail_start // block
    tail_nblk = A // block
    NEG = jnp.float32(-3e38)
    # the block-max table is carried NEG-padded to a 128-multiple lane
    # count (manual DMA extents must be tiling-aligned); pad lanes are
    # -3e38 so they never win the argmax and every masked write below
    # preserves them
    nb_pad = bm_hbm.shape[-1]

    slot = jax.lax.rem(g, 2)
    nslot = 1 - slot

    def prefetch(item, s):
        """Light phase for ``item`` into slot ``s``: argmax + refine, then
        launch every data-dependent fetch. Waits the slot's PREVIOUS
        output DMAs first (item-2's write-backs still own the scratch)."""

        @pl.when(item >= 2)
        def _():
            if "res" not in ablate:
                pltpu.make_async_copy(res_scr.at[s], res_out.at[0], sems.at[s, 5]).wait()
            if "windma" not in ablate:
                pltpu.make_async_copy(win_scr.at[s], fm_out.at[0, :, : upd_w], sems.at[s, 6]).wait()

            # item-2's tail write-back only exists if that item clipped
            # (pend_i[s, 4] still holds ITS flag — overwritten below)
            @pl.when(pend_i[s, 4] == 1)
            def _():
                pltpu.make_async_copy(tail_scr.at[s], fm_out.at[0, :, :A], sems.at[s, 7]).wait()

            pltpu.make_async_copy(bm_scr.at[s], bm_out.at[0], sems.at[s, 8]).wait()

        if "argmax" not in ablate:
            bm_dma = pltpu.make_async_copy(
                bm_hbm.at[item], bm_scr.at[s], sems.at[s, 0]
            )
            bm_dma.start()
            bm_dma.wait()
            atom, blk, _ = _first_max_2d(bm_scr[s])

            refine_dma = pltpu.make_async_copy(
                fm_hbm.at[item, pl.ds((atom // 8) * 8, 8), pl.ds(blk * block, block)],
                refine_scr,
                sems.at[s, 1],
            )
            refine_dma.start()
            refine_dma.wait()
            row_sel = (
                jax.lax.broadcasted_iota(jnp.int32, (8, block), 0)
                == atom - (atom // 8) * 8
            )
            seg2 = jnp.where(row_sel, refine_scr[:, :], NEG)
            value = jnp.max(seg2)
            ids2 = jax.lax.broadcasted_iota(jnp.int32, (8, block), 1)
            li = jnp.min(jnp.where(seg2 == value, ids2, jnp.int32(block)))
            position = blk * block + li - pad
        else:
            # perf stand-ins: vary position per item so window offsets
            # exercise realistic (unaligned, distinct) HBM regions
            atom = jax.lax.rem(item * 37, jnp.int32(d2_ref.shape[0]))
            position = jax.lax.rem(item * 997, jnp.int32(n_samples - A))
            value = jnp.float32(0.01)

        ustart = position + pad - (A - 1)
        ws_blk = jnp.minimum(ustart // block, n_blocks - upd_blocks)

        pend_i[s, 0] = atom
        pend_i[s, 1] = position
        pend_i[s, 2] = ws_blk
        pend_i[s, 3] = item
        if "res" not in ablate:
            pend_i[s, 4] = jnp.where(
                (position > n_samples - A) if gate_tail else True, 1, 0
            ).astype(jnp.int32)
        else:
            pend_i[s, 4] = jnp.int32(0)
        pend_f[s, 0] = value

        if "gram" not in ablate:
            pltpu.make_async_copy(
                gram_hbm.at[atom], gpad_scr.at[:, : 2 * A], sems.at[s, 2]
            ).start()
        if "res" not in ablate:
            pltpu.make_async_copy(
                res_hbm.at[item], res_scr.at[s], sems.at[s, 3]
            ).start()
        if "windma" not in ablate:
            pltpu.make_async_copy(
                fm_hbm.at[item, :, pl.ds(ws_blk * block, upd_w)],
                win_scr.at[s],
                sems.at[s, 4],
            ).start()

    # ---- prologue: item 0's light phase runs synchronously
    @pl.when(g == 0)
    def _():
        prefetch(jnp.int32(0), slot)

    # ---- heavy phase for item g (slot) ----
    atom = pend_i[slot, 0]
    position = pend_i[slot, 1]
    ws_blk = pend_i[slot, 2]
    value = pend_f[slot, 0]
    ws = ws_blk * block
    ustart = position + pad - (A - 1)

    clipped = pend_i[slot, 4] == 1

    if "res" not in ablate:
        # residual surgery (identical math to _step_kernel)
        pltpu.make_async_copy(res_hbm.at[g], res_scr.at[slot], sems.at[slot, 3]).wait()
        rot = _roll(res_scr[slot], L - position, interpret)
        rot = jnp.concatenate(
            [rot[:, :A] - value * d2_ref[pl.ds(atom, 1), :], rot[:, A:]], axis=1
        )
        restored = _roll(rot, position, interpret)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        res_scr[slot] = jnp.where(lane < n_samples, restored, 0.0)

        # boundary-tail recompute (Hankel roll ladder + MXU matmul) — only
        # when this item's event actually clipped the signal end (see
        # _step_kernel: for interior events the gram subtract is exact
        # everywhere, tail included)
        @pl.when(clipped)
        def _():
            t = res_scr[slot, :, n_samples - A :]
            hank_scr[:, :] = jnp.broadcast_to(t, (A, 2 * A))
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, 2 * A), 0)
            shift = 1
            while shift < A:
                rolled = _roll(hank_scr[:, :], 2 * A - shift, interpret)
                hank_scr[:, :] = jnp.where(
                    (row_ids & shift) != 0, rolled, hank_scr[:, :]
                )
                shift *= 2
            tail_scr[slot] = jax.lax.dot_general(
                d2_ref[:, :],
                hank_scr[:, :A],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        pltpu.make_async_copy(res_scr.at[slot], res_out.at[g], sems.at[slot, 5]).start()

    # gram-slice subtract into the window
    if "gram" not in ablate:
        pltpu.make_async_copy(
            gram_hbm.at[0], gpad_scr.at[:, : 2 * A], sems.at[slot, 2]
        ).wait()
    if "windma" not in ablate:
        pltpu.make_async_copy(
            fm_hbm.at[g, :, : upd_w], win_scr.at[slot], sems.at[slot, 4]
        ).wait()
    if "winvpu" not in ablate:
        if "gpadzero1" in ablate:
            # the pad region is rewritten with the same zeros every step —
            # write it once per kernel launch (candidate optimization;
            # exact, since only the DMA'd [0, 2A) region changes per step)
            @pl.when(g == 0)
            def _():
                gpad_scr[:, 2 * A :] = jnp.zeros((N, upd_w - 2 * A), jnp.float32)

        else:
            gpad_scr[:, 2 * A :] = jnp.zeros((N, upd_w - 2 * A), jnp.float32)
        placed = _roll(gpad_scr[:, :], ustart - ws, interpret)
        win_scr[slot] = win_scr[slot] - value * placed

    if "res" not in ablate:
        for k in range(upd_blocks):
            for j in range(tail_nblk):

                @pl.when(clipped & (ws_blk + k == tail_blk + j))
                def _(k=k, j=j):
                    win_scr[slot, :, k * block : (k + 1) * block] = tail_scr[
                        slot, :, j * block : (j + 1) * block
                    ]

    # write-backs: where window and tail overlap the spliced window blocks
    # EQUAL the tail bytes, so the two in-flight DMAs cannot disagree
    if "windma" not in ablate:
        pltpu.make_async_copy(
            win_scr.at[slot], fm_out.at[g, :, pl.ds(ws, upd_w)], sems.at[slot, 6]
        ).start()

    if "res" not in ablate:

        @pl.when(clipped)
        def _():
            pltpu.make_async_copy(
                tail_scr.at[slot], fm_out.at[g, :, pl.ds(tail_start, A)], sems.at[slot, 7]
            ).start()

    # block-max maintenance into bm_scr[slot], then write the row back
    if "bmm" not in ablate:
        wmax = jnp.max(win_scr[slot].reshape(N, upd_blocks, block), axis=-1)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, nb_pad), 1)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, nb_pad), 0)
        placer = (lane_b == ws_blk + row_k).astype(jnp.float32)
        wplaced = jax.lax.dot_general(
            wmax,
            placer,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lane_n = jax.lax.broadcasted_iota(jnp.int32, (N, nb_pad), 1)
        in_win = (lane_n >= ws_blk) & (lane_n < ws_blk + upd_blocks)
        bm_scr[slot] = jnp.where(in_win, wplaced, bm_scr[slot])

        if "res" not in ablate:

            @pl.when(clipped)
            def _():
                tmax = jnp.max(tail_scr[slot].reshape(N, tail_nblk, block), axis=-1)
                tplaced = jnp.concatenate(
                    [
                        jnp.zeros((N, tail_blk), jnp.float32),
                        tmax,
                        jnp.zeros((N, nb_pad - tail_blk - tail_nblk), jnp.float32),
                    ],
                    axis=1,
                )
                in_tail = (lane_n >= tail_blk) & (lane_n < tail_blk + tail_nblk)
                bm_scr[slot] = jnp.where(in_tail, tplaced, bm_scr[slot])

    pltpu.make_async_copy(bm_scr.at[slot], bm_out.at[g], sems.at[slot, 8]).start()

    atom_out[g, 0] = atom
    pos_out[g, 0] = position
    val_out[g, 0] = value

    # ---- light phase for item g+1 overlaps this item's write-backs
    @pl.when(g + 1 < n_items)
    def _():
        prefetch(g + 1, nslot)

    # ---- epilogue: drain the final write-backs (tail DMAs exist only
    # for clipped items — pend_i[s, 4] tracks which slots started one)
    @pl.when(g == n_items - 1)
    def _():
        if "res" not in ablate:
            pltpu.make_async_copy(res_scr.at[slot], res_out.at[0], sems.at[slot, 5]).wait()
        if "windma" not in ablate:
            pltpu.make_async_copy(win_scr.at[slot], fm_out.at[0, :, : upd_w], sems.at[slot, 6]).wait()

        @pl.when(pend_i[slot, 4] == 1)
        def _():
            pltpu.make_async_copy(tail_scr.at[slot], fm_out.at[0, :, :A], sems.at[slot, 7]).wait()

        pltpu.make_async_copy(bm_scr.at[slot], bm_out.at[0], sems.at[slot, 8]).wait()
        if n_items >= 2:
            # item n_items-2's write-backs were never drained by a
            # prefetch (there is no item n_items)
            if "res" not in ablate:
                pltpu.make_async_copy(res_scr.at[nslot], res_out.at[0], sems.at[nslot, 5]).wait()
            if "windma" not in ablate:
                pltpu.make_async_copy(win_scr.at[nslot], fm_out.at[0, :, : upd_w], sems.at[nslot, 6]).wait()

            @pl.when(pend_i[nslot, 4] == 1)
            def _():
                pltpu.make_async_copy(tail_scr.at[nslot], fm_out.at[0, :, :A], sems.at[nslot, 7]).wait()

            pltpu.make_async_copy(bm_scr.at[nslot], bm_out.at[0], sems.at[nslot, 8]).wait()


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
        "gate_tail",
        "interpret",
        "ablate",
    ),
)
def pallas_fused_step_pipelined(
    fm: jax.Array,
    bm: jax.Array,
    residual: jax.Array,
    d2: jax.Array,
    gram: jax.Array,
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    gate_tail: bool = True,
    interpret: bool = False,
    ablate: tuple = (),
):
    """Cross-item-pipelined fused greedy step (see ``_pipelined_step_kernel``).
    Same contract and numerics as :func:`pallas_fused_step` (unless
    ``ablate`` names phases to skip — perf measurement only)."""
    B, N, W = fm.shape
    A = atom_size
    upd_w = upd_blocks * block
    L = n_samples + A
    res3 = residual.reshape(B, 1, L)
    # the bm carry arrives NEG-padded to a 128-multiple lane count (manual
    # DMA extents must be tiling-aligned; see fast_mp's fused branch)
    nb_pad = bm.shape[-1]
    assert nb_pad % 128 == 0, "pipelined kernel needs a lane-padded bm"

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm
        pl.BlockSpec(memory_space=pl.ANY),  # gram
        pl.BlockSpec(memory_space=pl.ANY),  # residual
        pl.BlockSpec(memory_space=pl.ANY),  # bm
        pl.BlockSpec((N, A), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # residual (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # bm (aliased)
        pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]

    kernel = partial(
        _pipelined_step_kernel,
        n_samples=n_samples,
        atom_size=A,
        block=block,
        pad=pad,
        n_blocks=n_blocks,
        upd_blocks=upd_blocks,
        tail_start=tail_start,
        n_items=B,
        gate_tail=gate_tail,
        interpret=interpret,
        ablate=frozenset(ablate),
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
            pltpu.VMEM((2, N, nb_pad), jnp.float32),
            pltpu.VMEM((8, block), jnp.float32),
            pltpu.VMEM((2, 1, L), jnp.float32),
            pltpu.VMEM((N, upd_w), jnp.float32),
            pltpu.VMEM((2, N, upd_w), jnp.float32),
            pltpu.VMEM((A, 2 * A), jnp.float32),
            pltpu.VMEM((2, N, A), jnp.float32),
            pltpu.SMEM((2, 5), jnp.int32),
            pltpu.SMEM((2, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
        input_output_aliases={0: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=(
            # the double-buffered scratch set sums to ~14.7 MB at the
            # bench config (512x512 dict, 16k samples) and Mosaic's
            # compute temporaries push the scoped allocation to ~17.3 MB
            # — past the 16 MB default limit but nowhere near the v5e's
            # 128 MB VMEM. The grid is sequential over batch items, so a
            # single program instance owns the core; raise the limit
            # rather than un-double-buffer the DMA chain.
            pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024
            )
            if not interpret and PALLAS_AVAILABLE
            else None
        ),
    )(fm, gram, res3, bm, d2)
    return fm2, bm2, res2.reshape(B, L), atom[:, 0], pos[:, 0], val[:, 0]


def _whole_loop_kernel(
    # inputs
    fm_hbm,      # (B, N, W) ANY
    gram_hbm,    # (N, N, 2A) ANY
    res_hbm,     # (B, 1, L) ANY
    bm_hbm,      # (B, N, nb_pad) ANY
    d2_ref,      # (N, A) VMEM
    # outputs
    fm_out,      # aliased fm
    res_out,     # aliased residual
    bm_out,      # aliased bm
    atom_out,    # (n_steps, 1, 128) ANY int32
    pos_out,     # (n_steps, 1, 128) ANY int32
    val_out,     # (n_steps, 1, 128) ANY f32
    # scratch
    bm_res,      # (B, N, nb_pad) VMEM — RESIDENT block-max tables
    res_res,     # (B, 1, L) VMEM — RESIDENT residuals
    refine_scr,  # (8, block) VMEM
    gpad_scr,    # (S, N, upd_w) VMEM
    win_scr,     # (S, N, upd_w) VMEM
    hank_scr,    # (A, 2A) VMEM
    tail_scr,    # (S, N, A) VMEM
    ev_atom,     # (n_steps, 1, 128) VMEM int32
    ev_pos,      # (n_steps, 1, 128) VMEM int32
    ev_val,      # (n_steps, 1, 128) VMEM f32
    pend_i,      # (S, 5) SMEM int32: atom, position, ws_blk, item, clipped
    pend_f,      # (S, 1) SMEM f32: value
    sems,        # DMA semaphores (S, 3): 0 refine, 1 gram, 2 win_in
    wsems,       # DMA semaphores (S, 2): 0 win_out, 1 tail_out
    gsems,       # DMA semaphores (4,): resident load/store + event store
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    n_steps: int,
    n_items: int,
    depth: int,
    gate_tail: bool,
    interpret: bool,
    inner_loop: bool = False,
    ablate: frozenset = frozenset(),
):
    """Whole-encode fused kernel: ``grid = (n_steps, n_items)`` runs the
    entire greedy loop in ONE ``pallas_call``.

    ``inner_loop=True`` keeps the identical step body (``g_body``) but
    runs it as an in-kernel ``lax.fori_loop`` over a single grid step —
    trading Mosaic's per-grid-step dispatch/bookkeeping (measured in
    isolation by ``scripts/grid_overhead_probe.py``) for one hardware
    loop. Numerics, DMA pipeline structure, and prologue/epilogue
    placement (``pl.when`` on the linear index) are unchanged.

    vs. :func:`pallas_fused_step_pipelined` (one call per scan step):

    - the block-max tables and residuals are **resident in VMEM** for the
      whole encode (loaded once, stored once) — the per-(item, step) bm
      round-trip + residual round-trip (~0.8 MB at the judged config) and,
      more importantly, their two *serial DMA waits* per item disappear
      from the critical path;
    - prefetch depth ``depth`` (vs. 1): item g+depth's fetches are
      launched ``depth`` heavy-phases before consumption. The round-4
      phase ablation (trained_weights/kernel_ablation.json) showed the
      window fetch+write-back costing 26% of the encode *at near-peak
      HBM bandwidth* — the transfer itself was never hidden, because the
      depth-1 pipeline waits on a fetch it launched one phase earlier;
    - event outputs accumulate in VMEM and store once at the end.

    Cross-step hazards are spaced by construction: item b's state at step
    s+1 depends on its step-s update, which is ``n_items`` grid steps
    earlier — any prefetch depth < n_items - 1 is safe. Iteration order
    (items fastest) makes selections bit-identical to the per-step scan.

    ``ablate`` (compile-time, perf-measurement only — numerics are WRONG
    under any non-empty set) skips named phases, same convention as
    :func:`_pipelined_step_kernel`: "argmax" (resident-table argmax AND
    winner refine), "refine" (the winner-refine DMA + reduce only —
    isolates the serial start→wait latency the light phase pays every
    grid step), "res" (residual surgery + boundary-tail machinery),
    "winvpu" (window place-roll + subtract), "windma" (window fetch +
    write-back + their drains), "gramdma" (gram-row fetch), "bmm"
    (block-max maintenance on the resident table).
    """
    B = n_items
    total = n_steps * B
    S = depth + 1
    N = d2_ref.shape[0]
    A = atom_size
    L = n_samples + A
    upd_w = upd_blocks * block
    tail_blk = tail_start // block
    tail_nblk = A // block
    NEG = jnp.float32(-3e38)
    nb_pad = bm_hbm.shape[-1]

    def prefetch(i, slot):
        """Light phase for linear index ``i``: argmax on the RESIDENT
        table + winner refine, then launch the gram/window fetches."""
        item = jax.lax.rem(i, B)

        @pl.when(i >= S)
        def _():
            # slot's previous owner (linear i - S): drain its write-backs
            if "windma" not in ablate:
                pltpu.make_async_copy(
                    win_scr.at[slot], fm_out.at[0, :, :upd_w], wsems.at[slot, 0]
                ).wait()

            @pl.when(pend_i[slot, 4] == 1)
            def _():
                pltpu.make_async_copy(
                    tail_scr.at[slot], fm_out.at[0, :, :A], wsems.at[slot, 1]
                ).wait()

        if "argmax" not in ablate:
            atom, blk, _ = _first_max_2d(bm_res[item])
        else:
            # perf stand-ins: vary per linear index so DMA offsets stay
            # realistic (unaligned, distinct) without the table reduce
            atom = jax.lax.rem(i * 37, jnp.int32(N))
            blk = jax.lax.rem(i * 13, jnp.int32(n_blocks - upd_blocks))

        if "argmax" not in ablate and "refine" not in ablate:
            # NOTE: all fm reads go through fm_OUT — the same HBM buffer
            # as fm_hbm on TPU (input_output_aliases), but in interpret
            # mode the in/out refs are distinct buffers and this kernel
            # (unlike the per-step kernels, where items never read their
            # own call's writes) must see its own earlier write-backs
            refine_dma = pltpu.make_async_copy(
                fm_out.at[item, pl.ds((atom // 8) * 8, 8), pl.ds(blk * block, block)],
                refine_scr,
                sems.at[slot, 0],
            )
            refine_dma.start()
            refine_dma.wait()
            row_sel = (
                jax.lax.broadcasted_iota(jnp.int32, (8, block), 0)
                == atom - (atom // 8) * 8
            )
            seg2 = jnp.where(row_sel, refine_scr[:, :], NEG)
            value = jnp.max(seg2)
            ids2 = jax.lax.broadcasted_iota(jnp.int32, (8, block), 1)
            li = jnp.min(jnp.where(seg2 == value, ids2, jnp.int32(block)))
            position = blk * block + li - pad
        else:
            position = blk * block
            value = jnp.float32(0.01)

        ustart = position + pad - (A - 1)
        ws_blk = jnp.minimum(ustart // block, n_blocks - upd_blocks)

        pend_i[slot, 0] = atom
        pend_i[slot, 1] = position
        pend_i[slot, 2] = ws_blk
        pend_i[slot, 3] = item
        if "res" not in ablate:
            pend_i[slot, 4] = jnp.where(
                (position > n_samples - A) if gate_tail else True, 1, 0
            ).astype(jnp.int32)
        else:
            pend_i[slot, 4] = jnp.int32(0)
        pend_f[slot, 0] = value

        if "gramdma" not in ablate:
            pltpu.make_async_copy(
                gram_hbm.at[atom], gpad_scr.at[slot, :, : 2 * A], sems.at[slot, 1]
            ).start()
        if "windma" not in ablate:
            pltpu.make_async_copy(
                fm_out.at[item, :, pl.ds(ws_blk * block, upd_w)],
                win_scr.at[slot],
                sems.at[slot, 2],
            ).start()

    def g_body(g):
        s = g // B
        b = jax.lax.rem(g, B)
        # ---- prologue: load resident state, then fill the pipeline
        @pl.when(g == 0)
        def _():
            bm_load = pltpu.make_async_copy(bm_hbm, bm_res, gsems.at[0])
            bm_load.start()
            res_load = pltpu.make_async_copy(res_hbm, res_res, gsems.at[1])
            res_load.start()
            # the gram rows DMA into lanes [0, 2A) only; the [2A, upd_w) pad
            # that the placement roll reads is zeroed ONCE here instead of
            # every step (the per-step rewrite was measured exactness-
            # preserving and ~free, kernel_ablation.json 'gpadzero1' — kept
            # for the code-size win, not speed)
            for sl in range(S):
                gpad_scr[sl, :, 2 * A :] = jnp.zeros(
                    (N, upd_w - 2 * A), jnp.float32
                )
            bm_load.wait()
            res_load.wait()
            for i in range(depth):
                prefetch(jnp.int32(i), jnp.int32(i % S))

        # ---- heavy phase for linear g (slot g % S) ----
        slot = jax.lax.rem(g, S)
        atom = pend_i[slot, 0]
        position = pend_i[slot, 1]
        ws_blk = pend_i[slot, 2]
        item = pend_i[slot, 3]
        clipped = pend_i[slot, 4] == 1
        value = pend_f[slot, 0]
        ws = ws_blk * block
        ustart = position + pad - (A - 1)

        # residual surgery on the RESIDENT row (no DMA)
        if "res" not in ablate:
            rot = _roll(res_res[item], L - position, interpret)
            rot = jnp.concatenate(
                [rot[:, :A] - value * d2_ref[pl.ds(atom, 1), :], rot[:, A:]], axis=1
            )
            restored = _roll(rot, position, interpret)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            res_res[item] = jnp.where(lane < n_samples, restored, 0.0)

            # boundary-tail recompute (Hankel roll ladder + MXU matmul), gated
            @pl.when(clipped)
            def _():
                t = res_res[item, :, n_samples - A :]
                hank_scr[:, :] = jnp.broadcast_to(t, (A, 2 * A))
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, 2 * A), 0)
                shift = 1
                while shift < A:
                    rolled = _roll(hank_scr[:, :], 2 * A - shift, interpret)
                    hank_scr[:, :] = jnp.where(
                        (row_ids & shift) != 0, rolled, hank_scr[:, :]
                    )
                    shift *= 2
                tail_scr[slot] = jax.lax.dot_general(
                    d2_ref[:, :],
                    hank_scr[:, :A],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        # gram-slice subtract into the window
        if "gramdma" not in ablate:
            pltpu.make_async_copy(
                gram_hbm.at[0], gpad_scr.at[slot, :, : 2 * A], sems.at[slot, 1]
            ).wait()
        if "windma" not in ablate:
            pltpu.make_async_copy(
                fm_out.at[0, :, :upd_w], win_scr.at[slot], sems.at[slot, 2]
            ).wait()
        if "winvpu" not in ablate:
            placed = _roll(gpad_scr[slot], ustart - ws, interpret)
            win_scr[slot] = win_scr[slot] - value * placed

        if "res" not in ablate:
            for k in range(upd_blocks):
                for j in range(tail_nblk):

                    @pl.when(clipped & (ws_blk + k == tail_blk + j))
                    def _(k=k, j=j):
                        win_scr[slot, :, k * block : (k + 1) * block] = tail_scr[
                            slot, :, j * block : (j + 1) * block
                        ]

        # write-backs (waited when the slot is next reused, or at epilogue)
        if "windma" not in ablate:
            pltpu.make_async_copy(
                win_scr.at[slot], fm_out.at[item, :, pl.ds(ws, upd_w)], wsems.at[slot, 0]
            ).start()

        @pl.when(clipped)
        def _():
            pltpu.make_async_copy(
                tail_scr.at[slot], fm_out.at[item, :, pl.ds(tail_start, A)],
                wsems.at[slot, 1],
            ).start()

        # block-max maintenance directly on the RESIDENT table
        if "bmm" not in ablate:
            wmax = jnp.max(win_scr[slot].reshape(N, upd_blocks, block), axis=-1)
            lane_b = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, nb_pad), 1)
            row_k = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, nb_pad), 0)
            placer = (lane_b == ws_blk + row_k).astype(jnp.float32)
            wplaced = jax.lax.dot_general(
                wmax,
                placer,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lane_n = jax.lax.broadcasted_iota(jnp.int32, (N, nb_pad), 1)
            in_win = (lane_n >= ws_blk) & (lane_n < ws_blk + upd_blocks)
            bm_res[item] = jnp.where(in_win, wplaced, bm_res[item])

            @pl.when(clipped)
            def _():
                tmax = jnp.max(tail_scr[slot].reshape(N, tail_nblk, block), axis=-1)
                tplaced = jnp.concatenate(
                    [
                        jnp.zeros((N, tail_blk), jnp.float32),
                        tmax,
                        jnp.zeros((N, nb_pad - tail_blk - tail_nblk), jnp.float32),
                    ],
                    axis=1,
                )
                in_tail = (lane_n >= tail_blk) & (lane_n < tail_blk + tail_nblk)
                bm_res[item] = jnp.where(in_tail, tplaced, bm_res[item])

        # events: masked row write at (step s, lane b)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        hit = lane128 == b
        ev_atom[s] = jnp.where(hit, atom, ev_atom[s])
        ev_pos[s] = jnp.where(hit, position, ev_pos[s])
        ev_val[s] = jnp.where(hit, value, ev_val[s])

        # ---- steady-state prefetch
        @pl.when(g + depth < total)
        def _():
            prefetch(g + depth, jax.lax.rem(g + depth, S))

        # ---- epilogue: drain every slot's write-backs, store resident state
        @pl.when(g == total - 1)
        def _():
            for sl in range(S):
                if "windma" not in ablate:
                    pltpu.make_async_copy(
                        win_scr.at[sl], fm_out.at[0, :, :upd_w], wsems.at[sl, 0]
                    ).wait()

                @pl.when(pend_i[sl, 4] == 1)
                def _(sl=sl):
                    pltpu.make_async_copy(
                        tail_scr.at[sl], fm_out.at[0, :, :A], wsems.at[sl, 1]
                    ).wait()

            bm_store = pltpu.make_async_copy(bm_res, bm_out, gsems.at[0])
            bm_store.start()
            res_store = pltpu.make_async_copy(res_res, res_out, gsems.at[1])
            res_store.start()
            ev_dmas = [
                pltpu.make_async_copy(ev_atom, atom_out, gsems.at[2]),
                pltpu.make_async_copy(ev_pos, pos_out, gsems.at[3]),
            ]
            for dma in ev_dmas:
                dma.start()
            bm_store.wait()
            res_store.wait()
            for dma in ev_dmas:
                dma.wait()
            val_dma = pltpu.make_async_copy(ev_val, val_out, gsems.at[2])
            val_dma.start()
            val_dma.wait()

    if inner_loop:
        # ONE grid step: the greedy loop runs as an in-kernel
        # hardware loop, removing the per-grid-step Mosaic dispatch/
        # bookkeeping cost (scripts/grid_overhead_probe.py measures
        # it in isolation); numerics and pipeline structure identical
        def _iter(i, c):
            g_body(i)
            return c

        jax.lax.fori_loop(0, total, _iter, 0)
    else:
        g_body(pl.program_id(0) * B + pl.program_id(1))


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
        "n_steps",
        "depth",
        "gate_tail",
        "interpret",
        "inner_loop",
        "ablate",
    ),
)
def pallas_fused_encode(
    fm: jax.Array,
    bm: jax.Array,
    residual: jax.Array,
    d2: jax.Array,
    gram: jax.Array,
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    n_steps: int,
    depth: int = 2,
    gate_tail: bool = True,
    interpret: bool = False,
    inner_loop: bool = False,
    ablate: tuple = (),
):
    """Whole-encode fused greedy MP (see ``_whole_loop_kernel``). Returns
    (fm, bm, residual, atoms (n_steps, B), positions, values) — the same
    stacked layout a ``lax.scan`` over per-step kernels produces."""
    B, N, W = fm.shape
    A = atom_size
    upd_w = upd_blocks * block
    L = n_samples + A
    res3 = residual.reshape(B, 1, L)
    nb_pad = bm.shape[-1]
    S = depth + 1
    assert nb_pad % 128 == 0, "whole-loop kernel needs a lane-padded bm"
    assert B >= S, "prefetch depth must be < n_items"
    assert B <= 128, "event rows are single 128-lane vectors"

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm
        pl.BlockSpec(memory_space=pl.ANY),  # gram
        pl.BlockSpec(memory_space=pl.ANY),  # residual
        pl.BlockSpec(memory_space=pl.ANY),  # bm
        pl.BlockSpec((N, A), lambda *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # residual (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # bm (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # atoms
        pl.BlockSpec(memory_space=pl.ANY),  # positions
        pl.BlockSpec(memory_space=pl.ANY),  # values
    ]

    kernel = partial(
        _whole_loop_kernel,
        n_samples=n_samples,
        atom_size=A,
        block=block,
        pad=pad,
        n_blocks=n_blocks,
        upd_blocks=upd_blocks,
        tail_start=tail_start,
        n_steps=n_steps,
        n_items=B,
        depth=depth,
        gate_tail=gate_tail,
        interpret=interpret,
        inner_loop=inner_loop,
        ablate=frozenset(ablate),
    )

    fm2, res2, bm2, atom, pos, val = pl.pallas_call(
        kernel,
        grid=(1,) if inner_loop else (n_steps, B),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(fm.shape, fm.dtype),
            jax.ShapeDtypeStruct(res3.shape, res3.dtype),
            jax.ShapeDtypeStruct(bm.shape, bm.dtype),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, N, nb_pad), jnp.float32),   # bm_res
            pltpu.VMEM((B, 1, L), jnp.float32),        # res_res
            pltpu.VMEM((8, block), jnp.float32),       # refine
            pltpu.VMEM((S, N, upd_w), jnp.float32),    # gpad
            pltpu.VMEM((S, N, upd_w), jnp.float32),    # win
            pltpu.VMEM((A, 2 * A), jnp.float32),       # hank
            pltpu.VMEM((S, N, A), jnp.float32),        # tail
            pltpu.VMEM((n_steps, 1, 128), jnp.int32),   # ev_atom
            pltpu.VMEM((n_steps, 1, 128), jnp.int32),   # ev_pos
            pltpu.VMEM((n_steps, 1, 128), jnp.float32), # ev_val
            pltpu.SMEM((S, 5), jnp.int32),
            pltpu.SMEM((S, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((S, 3)),
            pltpu.SemaphoreType.DMA((S, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={0: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=(
            # resident bm (B*N*nb_pad) + residuals + S-deep window/gram
            # slots total ~35 MB at the judged config — well under the
            # v5e's 128 MB VMEM but past the 16 MB default scoped limit
            pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
            )
            if not interpret and PALLAS_AVAILABLE
            else None
        ),
    )(fm, gram, res3, bm, d2)
    return (
        fm2,
        bm2,
        res2.reshape(B, L),
        atom[:, 0, :B],
        pos[:, 0, :B],
        val[:, 0, :B],
    )


def _first_max_2d_with_aux(x: jax.Array, aux: jax.Array):
    """(row, col, value, aux[argmax]) of the first maximum of ``x`` in
    row-major order. ``aux`` is an int32 array of the same shape whose
    value at the winning element is returned via a second masked reduce
    (no dynamic scalar indexing — Mosaic-friendly)."""
    rows, cols = x.shape
    m = jnp.max(x)
    flat_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * cols + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    )
    big = jnp.int32(rows * cols)
    fi = jnp.min(jnp.where(x == m, flat_ids, big))
    a = jnp.min(jnp.where(flat_ids == fi, aux, jnp.int32(2**30)))
    return fi // cols, fi % cols, m, a


def _whole_loop_lane_kernel(
    # inputs
    fm_hbm,      # (B, N, W) ANY
    gram_hbm,    # (N, N, 2A) ANY
    res_hbm,     # (B, 1, L) ANY
    bm_hbm,      # (B, N, nb_pad) ANY
    lane_hbm,    # (B, N, nb_pad) ANY int32 — per-block argmax lanes
    d2_ref,      # (N, A) VMEM
    # outputs
    fm_out,      # aliased fm
    res_out,     # aliased residual
    bm_out,      # aliased bm
    atom_out,    # (n_steps, 1, 128) ANY int32
    pos_out,     # (n_steps, 1, 128) ANY int32
    val_out,     # (n_steps, 1, 128) ANY f32
    # scratch
    bm_res,      # (B, N, nb_pad) VMEM — RESIDENT block-max values
    lane_res,    # (B, N, nb_pad) VMEM int32 — RESIDENT block argmax lanes
    res_res,     # (B, 1, L) VMEM — RESIDENT residuals
    gpad_scr,    # (S, N, upd_w) VMEM
    win_scr,     # (S, N, upd_w) VMEM
    hank_scr,    # (A, 2A) VMEM
    tail_scr,    # (S, N, A) VMEM
    ev_atom,     # (n_steps, 1, 128) VMEM int32
    ev_pos,      # (n_steps, 1, 128) VMEM int32
    ev_val,      # (n_steps, 1, 128) VMEM f32
    pend_i,      # (S, 5) SMEM int32: atom, position, ws_blk, item, clipped
    pend_f,      # (S, 1) SMEM f32: value
    sems,        # DMA semaphores (S, 2): 0 gram, 1 win_in
    wsems,       # DMA semaphores (S, 2): 0 win_out, 1 tail_out
    gsems,       # DMA semaphores (4,): resident loads/stores + event store
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    n_steps: int,
    n_items: int,
    depth: int,
    gate_tail: bool,
    interpret: bool,
):
    """Whole-encode fused kernel with a RESIDENT per-block argmax-lane
    table — no refine DMA anywhere.

    vs. :func:`_whole_loop_kernel`: that kernel's prefetch still pays one
    serial HBM round trip per (item, step) — an 8-row fm slab fetched to
    locate the winner's exact lane (started and immediately waited, so
    prefetch depth cannot hide it). But the winning VALUE is already the
    block-max table entry, and the winning LANE can be maintained
    residently: block-max maintenance computes ``max`` over the updated
    window while it sits in VMEM — one extra masked-min per block yields
    its first-argmax lane for the same table columns. Prefetch becomes
    pure VPU work on resident state plus two DMA *starts*; the only
    remaining per-step waits are the (depth-ahead) gram/window fetches.

    Tie-breaking parity: per-block lanes are first-max (masked min over
    an iota, exactly the refine slab's semantics) and the global argmax
    keeps first-flat-index order, so selections stay bit-identical to
    the per-step engines (tests/test_fast_mp.py).
    """
    s = pl.program_id(0)
    b = pl.program_id(1)
    B = n_items
    g = s * B + b
    total = n_steps * B
    S = depth + 1
    N = d2_ref.shape[0]
    A = atom_size
    L = n_samples + A
    upd_w = upd_blocks * block
    tail_blk = tail_start // block
    tail_nblk = A // block
    nb_pad = bm_hbm.shape[-1]

    def prefetch(i, slot):
        """Light phase for linear index ``i``: argmax + lane lookup on the
        RESIDENT tables, then launch the gram/window fetches. No DMA
        waits except draining the slot's previous write-backs."""
        item = jax.lax.rem(i, B)

        @pl.when(i >= S)
        def _():
            pltpu.make_async_copy(
                win_scr.at[slot], fm_out.at[0, :, :upd_w], wsems.at[slot, 0]
            ).wait()

            @pl.when(pend_i[slot, 4] == 1)
            def _():
                pltpu.make_async_copy(
                    tail_scr.at[slot], fm_out.at[0, :, :A], wsems.at[slot, 1]
                ).wait()

        atom, blk, value, li = _first_max_2d_with_aux(
            bm_res[item], lane_res[item]
        )
        position = blk * block + li - pad

        ustart = position + pad - (A - 1)
        ws_blk = jnp.minimum(ustart // block, n_blocks - upd_blocks)

        pend_i[slot, 0] = atom
        pend_i[slot, 1] = position
        pend_i[slot, 2] = ws_blk
        pend_i[slot, 3] = item
        pend_i[slot, 4] = jnp.where(
            (position > n_samples - A) if gate_tail else True, 1, 0
        ).astype(jnp.int32)
        pend_f[slot, 0] = value

        pltpu.make_async_copy(
            gram_hbm.at[atom], gpad_scr.at[slot, :, : 2 * A], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            fm_out.at[item, :, pl.ds(ws_blk * block, upd_w)],
            win_scr.at[slot],
            sems.at[slot, 1],
        ).start()

    # ---- prologue: load resident state, then fill the pipeline
    @pl.when(g == 0)
    def _():
        bm_load = pltpu.make_async_copy(bm_hbm, bm_res, gsems.at[0])
        bm_load.start()
        res_load = pltpu.make_async_copy(res_hbm, res_res, gsems.at[1])
        res_load.start()
        lane_load = pltpu.make_async_copy(lane_hbm, lane_res, gsems.at[2])
        lane_load.start()
        for sl in range(S):
            gpad_scr[sl, :, 2 * A :] = jnp.zeros(
                (N, upd_w - 2 * A), jnp.float32
            )
        bm_load.wait()
        res_load.wait()
        lane_load.wait()
        for i in range(depth):
            prefetch(jnp.int32(i), jnp.int32(i % S))

    # ---- heavy phase for linear g (slot g % S) ----
    slot = jax.lax.rem(g, S)
    atom = pend_i[slot, 0]
    position = pend_i[slot, 1]
    ws_blk = pend_i[slot, 2]
    item = pend_i[slot, 3]
    clipped = pend_i[slot, 4] == 1
    value = pend_f[slot, 0]
    ws = ws_blk * block
    ustart = position + pad - (A - 1)

    # residual surgery on the RESIDENT row (no DMA)
    rot = _roll(res_res[item], L - position, interpret)
    rot = jnp.concatenate(
        [rot[:, :A] - value * d2_ref[pl.ds(atom, 1), :], rot[:, A:]], axis=1
    )
    restored = _roll(rot, position, interpret)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    res_res[item] = jnp.where(lane < n_samples, restored, 0.0)

    # boundary-tail recompute (Hankel roll ladder + MXU matmul), gated
    @pl.when(clipped)
    def _():
        t = res_res[item, :, n_samples - A :]
        hank_scr[:, :] = jnp.broadcast_to(t, (A, 2 * A))
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (A, 2 * A), 0)
        shift = 1
        while shift < A:
            rolled = _roll(hank_scr[:, :], 2 * A - shift, interpret)
            hank_scr[:, :] = jnp.where(
                (row_ids & shift) != 0, rolled, hank_scr[:, :]
            )
            shift *= 2
        tail_scr[slot] = jax.lax.dot_general(
            d2_ref[:, :],
            hank_scr[:, :A],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # gram-slice subtract into the window
    pltpu.make_async_copy(
        gram_hbm.at[0], gpad_scr.at[slot, :, : 2 * A], sems.at[slot, 0]
    ).wait()
    pltpu.make_async_copy(
        fm_out.at[0, :, :upd_w], win_scr.at[slot], sems.at[slot, 1]
    ).wait()
    placed = _roll(gpad_scr[slot], ustart - ws, interpret)
    win_scr[slot] = win_scr[slot] - value * placed

    for k in range(upd_blocks):
        for j in range(tail_nblk):

            @pl.when(clipped & (ws_blk + k == tail_blk + j))
            def _(k=k, j=j):
                win_scr[slot, :, k * block : (k + 1) * block] = tail_scr[
                    slot, :, j * block : (j + 1) * block
                ]

    # write-backs (waited when the slot is next reused, or at epilogue)
    pltpu.make_async_copy(
        win_scr.at[slot], fm_out.at[item, :, pl.ds(ws, upd_w)], wsems.at[slot, 0]
    ).start()

    @pl.when(clipped)
    def _():
        pltpu.make_async_copy(
            tail_scr.at[slot], fm_out.at[item, :, pl.ds(tail_start, A)],
            wsems.at[slot, 1],
        ).start()

    # block-max + block-lane maintenance on the RESIDENT tables: one
    # reshape-max for the values (as before) plus one masked-min for the
    # first-argmax lanes, both while the window is already in VMEM
    win3 = win_scr[slot].reshape(N, upd_blocks, block)
    wmax = jnp.max(win3, axis=-1)
    ids3 = jax.lax.broadcasted_iota(jnp.int32, (N, upd_blocks, block), 2)
    wlane = jnp.min(
        jnp.where(win3 == wmax[:, :, None], ids3, jnp.int32(block)), axis=-1
    )
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, nb_pad), 1)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (upd_blocks, nb_pad), 0)
    placer = (lane_b == ws_blk + row_k).astype(jnp.float32)
    wplaced = jax.lax.dot_general(
        wmax,
        placer,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # lanes ride the same one-hot placer (exact: lane values < block <=
    # 2^23 are representable in f32)
    lplaced = jax.lax.dot_general(
        wlane.astype(jnp.float32),
        placer,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (N, nb_pad), 1)
    in_win = (lane_n >= ws_blk) & (lane_n < ws_blk + upd_blocks)
    bm_res[item] = jnp.where(in_win, wplaced, bm_res[item])
    lane_res[item] = jnp.where(
        in_win, lplaced.astype(jnp.int32), lane_res[item]
    )

    @pl.when(clipped)
    def _():
        tail3 = tail_scr[slot].reshape(N, tail_nblk, block)
        tmax = jnp.max(tail3, axis=-1)
        tids = jax.lax.broadcasted_iota(jnp.int32, (N, tail_nblk, block), 2)
        tlane = jnp.min(
            jnp.where(tail3 == tmax[:, :, None], tids, jnp.int32(block)),
            axis=-1,
        )
        tplaced = jnp.concatenate(
            [
                jnp.zeros((N, tail_blk), jnp.float32),
                tmax,
                jnp.zeros((N, nb_pad - tail_blk - tail_nblk), jnp.float32),
            ],
            axis=1,
        )
        tlplaced = jnp.concatenate(
            [
                jnp.zeros((N, tail_blk), jnp.int32),
                tlane,
                jnp.zeros((N, nb_pad - tail_blk - tail_nblk), jnp.int32),
            ],
            axis=1,
        )
        in_tail = (lane_n >= tail_blk) & (lane_n < tail_blk + tail_nblk)
        bm_res[item] = jnp.where(in_tail, tplaced, bm_res[item])
        lane_res[item] = jnp.where(in_tail, tlplaced, lane_res[item])

    # events: masked row write at (step s, lane b)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    hit = lane128 == b
    ev_atom[s] = jnp.where(hit, atom, ev_atom[s])
    ev_pos[s] = jnp.where(hit, position, ev_pos[s])
    ev_val[s] = jnp.where(hit, value, ev_val[s])

    # ---- steady-state prefetch
    @pl.when(g + depth < total)
    def _():
        prefetch(g + depth, jax.lax.rem(g + depth, S))

    # ---- epilogue: drain every slot's write-backs, store resident state
    @pl.when(g == total - 1)
    def _():
        for sl in range(S):
            pltpu.make_async_copy(
                win_scr.at[sl], fm_out.at[0, :, :upd_w], wsems.at[sl, 0]
            ).wait()

            @pl.when(pend_i[sl, 4] == 1)
            def _(sl=sl):
                pltpu.make_async_copy(
                    tail_scr.at[sl], fm_out.at[0, :, :A], wsems.at[sl, 1]
                ).wait()

        bm_store = pltpu.make_async_copy(bm_res, bm_out, gsems.at[0])
        bm_store.start()
        res_store = pltpu.make_async_copy(res_res, res_out, gsems.at[1])
        res_store.start()
        ev_dmas = [
            pltpu.make_async_copy(ev_atom, atom_out, gsems.at[2]),
            pltpu.make_async_copy(ev_pos, pos_out, gsems.at[3]),
        ]
        for dma in ev_dmas:
            dma.start()
        bm_store.wait()
        res_store.wait()
        for dma in ev_dmas:
            dma.wait()
        val_dma = pltpu.make_async_copy(ev_val, val_out, gsems.at[2])
        val_dma.start()
        val_dma.wait()


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
        "n_steps",
        "depth",
        "gate_tail",
        "interpret",
    ),
)
def pallas_fused_encode_lane(
    fm: jax.Array,
    bm: jax.Array,
    lanes: jax.Array,
    residual: jax.Array,
    d2: jax.Array,
    gram: jax.Array,
    *,
    n_samples: int,
    atom_size: int,
    block: int,
    pad: int,
    n_blocks: int,
    upd_blocks: int,
    tail_start: int,
    n_steps: int,
    depth: int = 2,
    gate_tail: bool = True,
    interpret: bool = False,
):
    """Whole-encode fused greedy MP with a resident argmax-lane table
    (see ``_whole_loop_lane_kernel``). ``lanes`` is the per-(item, atom,
    block) FIRST-argmax lane of the initial correlation map, int32, same
    (padded) shape as ``bm``. Same contract as
    :func:`pallas_fused_encode`."""
    B, N, W = fm.shape
    A = atom_size
    upd_w = upd_blocks * block
    L = n_samples + A
    res3 = residual.reshape(B, 1, L)
    nb_pad = bm.shape[-1]
    S = depth + 1
    assert nb_pad % 128 == 0, "lane kernel needs a lane-padded bm"
    assert lanes.shape == bm.shape and lanes.dtype == jnp.int32
    assert B >= S, "prefetch depth must be < n_items"
    assert B <= 128, "event rows are single 128-lane vectors"

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm
        pl.BlockSpec(memory_space=pl.ANY),  # gram
        pl.BlockSpec(memory_space=pl.ANY),  # residual
        pl.BlockSpec(memory_space=pl.ANY),  # bm
        pl.BlockSpec(memory_space=pl.ANY),  # lanes
        pl.BlockSpec((N, A), lambda s, b: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # fm (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # residual (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # bm (aliased)
        pl.BlockSpec(memory_space=pl.ANY),  # atoms
        pl.BlockSpec(memory_space=pl.ANY),  # positions
        pl.BlockSpec(memory_space=pl.ANY),  # values
    ]

    kernel = partial(
        _whole_loop_lane_kernel,
        n_samples=n_samples,
        atom_size=A,
        block=block,
        pad=pad,
        n_blocks=n_blocks,
        upd_blocks=upd_blocks,
        tail_start=tail_start,
        n_steps=n_steps,
        n_items=B,
        depth=depth,
        gate_tail=gate_tail,
        interpret=interpret,
    )

    fm2, res2, bm2, atom, pos, val = pl.pallas_call(
        kernel,
        grid=(n_steps, B),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(fm.shape, fm.dtype),
            jax.ShapeDtypeStruct(res3.shape, res3.dtype),
            jax.ShapeDtypeStruct(bm.shape, bm.dtype),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, N, nb_pad), jnp.float32),   # bm_res
            pltpu.VMEM((B, N, nb_pad), jnp.int32),     # lane_res
            pltpu.VMEM((B, 1, L), jnp.float32),        # res_res
            pltpu.VMEM((S, N, upd_w), jnp.float32),    # gpad
            pltpu.VMEM((S, N, upd_w), jnp.float32),    # win
            pltpu.VMEM((A, 2 * A), jnp.float32),       # hank
            pltpu.VMEM((S, N, A), jnp.float32),        # tail
            pltpu.VMEM((n_steps, 1, 128), jnp.int32),   # ev_atom
            pltpu.VMEM((n_steps, 1, 128), jnp.int32),   # ev_pos
            pltpu.VMEM((n_steps, 1, 128), jnp.float32), # ev_val
            pltpu.SMEM((S, 5), jnp.int32),
            pltpu.SMEM((S, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((S, 2)),
            pltpu.SemaphoreType.DMA((S, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={0: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=(
            # resident bm + lane tables (2x B*N*nb_pad) + residuals +
            # S-deep window/gram slots — ~55 MB at the judged config with
            # block=128, well under the v5e's 128 MB VMEM
            pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
            )
            if not interpret and PALLAS_AVAILABLE
            else None
        ),
    )(fm, gram, res3, bm, lanes, d2)
    return (
        fm2,
        bm2,
        res2.reshape(B, L),
        atom[:, 0, :B],
        pos[:, 0, :B],
        val[:, 0, :B],
    )


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
