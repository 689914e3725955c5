"""Fast greedy matching pursuit: incremental correlation updates.

The naive greedy loop re-correlates the full residual against the whole
dictionary every step (O(steps * n_samples * atom_size * n_atoms) MACs).
But subtracting ``v * d[a]`` at position ``p`` changes the correlation map
by exactly ``-v * gram[a]`` in a ``2*atom_size-1`` window around ``p``,
where ``gram[a, b, l] = sum_k d[a, k] * d[b, k - l]`` is the dictionary
auto-correlation — so after one initial correlation, each greedy step is:

  argmax over the map  ->  subtract a gram slice  ->  fix the boundary.

The boundary fix: the reference clips atom energy past the signal end
(``matchingpursuit.py:31-56`` pad-and-trim), so for events with
``p > n_samples - atom_size`` the full-gram update is wrong for map
positions whose window overlaps the clipped tail. Those are only the last
``atom_size`` positions — recomputed exactly each step with one small
(batch, atom_size, atom_size) x (atom_size, n_atoms) matmul on the MXU.

Per step: O(n_atoms * atom_size) gram update + O(atom_size^2 * n_atoms)
boundary matmul — ~30x fewer FLOPs than the naive loop at the benchmark
config (512 atoms x 512 taps x 16k samples), and the argmax reduction
becomes the bottleneck. Numerically identical selections to
``sparse_code`` up to float accumulation (validated in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.correlation import mp_correlate
from ..ops.norms import unit_norm
from .matching_pursuit import SparseCodeResult, _normalize_dict
from .pallas_mp import PALLAS_AVAILABLE, pallas_boundary_update
from .pallas_fused_mp import (
    pallas_fused_step,
    pallas_fused_step_pipelined,
    pallas_fused_encode,
    pallas_fused_encode_lane,
    fused_step_applicable,
)


def dictionary_gram(d: jax.Array) -> jax.Array:
    """(n_atoms, n_atoms, 2*atom_size-1) full-lag auto-correlation.

    ``gram[a, b, A-1 + s] = sum_k d[a, k] * d[b, k - s]`` — the change to
    atom b's correlation at offset s when atom a is subtracted.
    """
    n_atoms, atom_size = d.shape
    padded = jnp.pad(d, ((0, 0), (atom_size - 1, atom_size - 1)))
    # conv with flipped kernels == correlation at all lags
    return lax.conv_general_dilated(
        padded[:, None, :],
        d[:, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )  # (n_atoms signals, n_atoms filters, 2A-1)


@partial(
    jax.jit,
    static_argnames=(
        "n_steps", "block", "block_argmax", "use_pallas", "fused",
        "pipelined", "gate_tail", "whole_loop", "depth", "lane_table",
        "inner_loop",
    ),
)
def sparse_code_fast(
    signal: jax.Array,
    d: jax.Array,
    n_steps: int = 100,
    block: int = 512,
    block_argmax: bool = False,
    use_pallas: bool = False,
    fused: bool = False,
    pipelined: bool = True,
    gate_tail: bool = True,
    whole_loop: bool = False,
    depth: int = 2,
    lane_table: bool = False,
    inner_loop: bool = False,
) -> SparseCodeResult:
    """Drop-in fast path for ``sparse_code`` (1-channel dictionaries).

    Beyond the incremental gram update, the argmax is hierarchical: a
    per-(atom, block) running maximum table is maintained incrementally —
    each step only re-reduces the blocks its own update touched — so the
    global argmax reads the small table plus one block instead of the
    whole correlation map. Tie-breaking (first index) matches the flat
    argmax exactly.
    """
    if signal.ndim == 2:
        signal = signal[:, None, :]
    batch, channels, n_samples = signal.shape
    assert channels == 1, "fast path supports single-channel signals"
    d2 = d if d.ndim == 2 else d[:, 0, :]
    n_atoms, atom_size = d2.shape
    d2 = unit_norm(d2)

    gram = dictionary_gram(d2)  # (A_idx, n_atoms, 2A-1)
    # lane-alignment matters: pad to a multiple of the block size so the
    # padded buffer keeps TPU-friendly tiling and blocks are aligned
    pad = ((atom_size - 1 + block - 1) // block) * block
    W = ((n_samples + 2 * pad + block - 1) // block) * block
    right_pad = W - n_samples - pad
    n_blocks = W // block

    # initial full correlation (the only full-size conv). The pad regions
    # are poisoned with -inf-ish values so the argmax can run over the
    # whole padded buffer without materializing a contiguous valid-slice
    # copy every step (a ~270MB/step saving at the benchmark config);
    # gram updates only ever *subtract bounded deltas* there, so the
    # poison survives in f32.
    NEG = jnp.float32(-1e30)
    fm0 = mp_correlate(signal, d2)  # (B, n_atoms, n_samples)
    fm0 = jnp.pad(
        fm0, ((0, 0), (0, 0), (pad, right_pad)), constant_values=NEG
    )
    # per-(atom, block) running maxima
    blockmax0 = jnp.max(
        fm0.reshape(batch, n_atoms, n_blocks, block), axis=-1
    )

    # residual kept padded by atom_size; tail zeroed after each subtract
    res0 = jnp.pad(signal[:, 0, :], ((0, 0), (0, atom_size)))

    # boundary-fix gather indices: windows starting at the last A positions
    tail_starts = n_samples - atom_size + jnp.arange(atom_size)
    tail_idx = tail_starts[:, None] + jnp.arange(atom_size)[None, :]

    # a (2A-1)-wide update window can straddle this many aligned blocks
    upd_blocks = (2 * atom_size - 1 + block - 1) // block + 1
    # the boundary-recompute region occupies these (static) blocks
    tail_lo = (pad + n_samples - atom_size) // block
    tail_hi = (pad + n_samples - 1) // block
    tail_nblk = tail_hi - tail_lo + 1

    # the fused Pallas tail kernel needs the tail to start on an
    # atom_size-aligned offset within the padded map (true for the usual
    # power-of-two configs); fall back to the XLA ops otherwise
    tail_start = pad + n_samples - atom_size
    use_pallas = (
        use_pallas
        and PALLAS_AVAILABLE
        and tail_start % atom_size == 0
        and atom_size % block == 0
        and n_atoms % 8 == 0
    )

    if fused and fused_step_applicable(n_samples, atom_size, block, pad, n_atoms):
        # whole-step fused Pallas kernel (argmax + refine + surgery +
        # gram window + boundary tail + block-max repair in ONE kernel);
        # map/table/residual carries are aliased in place across the scan
        interpret = jax.default_backend() == "cpu"
        # zero-pad the lag axis to 2A so DMA extents are 128-aligned
        gram_p = jnp.pad(gram, ((0, 0), (0, 0), (0, 1)))

        # cross-item software pipelining hides the per-item serial DMA
        # chain behind the neighboring item's compute (see
        # pallas_fused_mp._pipelined_step_kernel); numerics identical
        step_impl = (
            pallas_fused_step_pipelined if pipelined else pallas_fused_step
        )
        whole_loop = whole_loop and batch >= depth + 1 and batch <= 128
        if pipelined or whole_loop:
            # these kernels DMA bm rows manually, so the lane count must
            # be a 128 multiple; -3e38 pad lanes never win the argmax and
            # survive every masked table write
            nb_pad = ((n_blocks + 127) // 128) * 128
            blockmax0 = jnp.pad(
                blockmax0,
                ((0, 0), (0, 0), (0, nb_pad - n_blocks)),
                constant_values=-3e38,
            )

        if whole_loop and lane_table:
            # lane-table whole-encode kernel: additionally keeps the
            # per-block FIRST-argmax lane resident, killing the per-step
            # refine DMA round trip (pallas_fused_mp._whole_loop_lane_kernel)
            blocklane0 = jnp.argmax(
                fm0.reshape(batch, n_atoms, n_blocks, block), axis=-1
            ).astype(jnp.int32)
            nb_pad = blockmax0.shape[-1]
            blocklane0 = jnp.pad(
                blocklane0, ((0, 0), (0, 0), (0, nb_pad - n_blocks))
            )
            _, _, residual, atom_indices, positions, values = (
                pallas_fused_encode_lane(
                    fm0,
                    blockmax0,
                    blocklane0,
                    res0,
                    d2,
                    gram_p,
                    n_samples=n_samples,
                    atom_size=atom_size,
                    block=block,
                    pad=pad,
                    n_blocks=n_blocks,
                    upd_blocks=upd_blocks,
                    tail_start=tail_start,
                    n_steps=n_steps,
                    depth=depth,
                    gate_tail=gate_tail,
                    interpret=interpret,
                )
            )
            return SparseCodeResult(
                atom_indices, positions, values, residual[:, None, :n_samples]
            )

        if whole_loop:
            # whole-encode kernel: the entire greedy loop in ONE
            # pallas_call with resident VMEM state and a depth-deep
            # prefetch pipeline (see pallas_fused_mp._whole_loop_kernel)
            _, _, residual, atom_indices, positions, values = (
                pallas_fused_encode(
                    fm0,
                    blockmax0,
                    res0,
                    d2,
                    gram_p,
                    n_samples=n_samples,
                    atom_size=atom_size,
                    block=block,
                    pad=pad,
                    n_blocks=n_blocks,
                    upd_blocks=upd_blocks,
                    tail_start=tail_start,
                    n_steps=n_steps,
                    depth=depth,
                    gate_tail=gate_tail,
                    interpret=interpret,
                    inner_loop=inner_loop,
                )
            )
            return SparseCodeResult(
                atom_indices, positions, values, residual[:, None, :n_samples]
            )

        def fused_scan_step(carry, _):
            residual, fm, bm = carry
            fm, bm, residual, atom, pos, val = step_impl(
                fm,
                bm,
                residual,
                d2,
                gram_p,
                n_samples=n_samples,
                atom_size=atom_size,
                block=block,
                pad=pad,
                n_blocks=n_blocks,
                upd_blocks=upd_blocks,
                tail_start=tail_start,
                gate_tail=gate_tail,
                interpret=interpret,
            )
            return (residual, fm, bm), (atom, pos, val)

        (residual, _, _), (atom_indices, positions, values) = lax.scan(
            fused_scan_step, (res0, fm0, blockmax0), None, length=n_steps
        )
        return SparseCodeResult(
            atom_indices, positions, values, residual[:, None, :n_samples]
        )
    elif fused:
        # fused requested but shapes fail the alignment gate: fall back to
        # the next-best engine, not the slowest flat-argmax path
        block_argmax = True

    def step(carry, _):
        residual, fm, bm = carry

        if block_argmax:
            # 1) global argmax over the tiny block-max table, then refine
            # within the single winning block. NOTE: on the axon backend
            # this variant compiles pathologically slowly, so it is
            # opt-in; runtime-wise it reads ~10x less HBM per step.
            flat_m = bm.reshape(batch, -1)
            midx = jnp.argmax(flat_m, axis=-1)
            atom_index = (midx // n_blocks).astype(jnp.int32)
            blk = (midx % n_blocks).astype(jnp.int32)

            def refine(fb, a, b_):
                seg = lax.dynamic_slice(fb, (a, b_ * block), (1, block))[0]
                li = jnp.argmax(seg).astype(jnp.int32)
                return li, seg[li]

            li, value = jax.vmap(refine)(fm, atom_index, blk)
            position = blk * block + li - pad
        else:
            flat = fm.reshape(batch, -1)
            idx = jnp.argmax(flat, axis=-1)
            value = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]
            atom_index = (idx // W).astype(jnp.int32)
            position = (idx % W).astype(jnp.int32) - pad

        # 2) residual surgery (clip semantics)
        def sub(r, a, p, v):
            seg = lax.dynamic_slice(r, (p,), (atom_size,))
            return lax.dynamic_update_slice(r, seg - v * d2[a], (p,))

        residual = jax.vmap(sub)(residual, atom_index, position, value)
        residual = residual.at[:, n_samples:].set(0.0)

        # 3) incremental map update:
        #    fm[b, :, p-(A-1) .. p+(A-1)] -= v * gram[a]
        ustart = position + pad - (atom_size - 1)

        def upd(f, a, s, v):
            window = lax.dynamic_slice(
                f, (0, s), (n_atoms, 2 * atom_size - 1)
            )
            return lax.dynamic_update_slice(f, window - v * gram[a], (0, s))

        fm = jax.vmap(upd)(fm, atom_index, ustart, value)

        # 4) exact boundary recompute for the last atom_size positions,
        #    fused (matmul + map write + block max) on the MXU when the
        #    Pallas kernel is applicable
        if use_pallas:
            windows = residual[:, tail_idx]           # (B, A, A)
            fm, bm = pallas_boundary_update(
                fm, bm, windows, d2, tail_start, block
            )
        else:
            # correlation of the residual tail segment with every atom —
            # a small VALID conv on the MXU; avoids materializing the
            # (B, A, A) Hankel gather
            seg = lax.dynamic_slice(
                residual,
                (0, n_samples - atom_size),
                (batch, 2 * atom_size - 1),
            )
            tail_fm = lax.conv_general_dilated(
                seg[:, None, :],
                d2[:, None, :],
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=jnp.float32,
            )                                         # (B, n_atoms, A)
            fm = lax.dynamic_update_slice(fm, tail_fm, (0, 0, tail_start))
            if block_argmax:
                if tail_start % block == 0 and atom_size % block == 0:
                    tail_max = tail_fm.reshape(
                        batch, n_atoms, atom_size // block, block
                    ).max(-1)
                else:
                    # tail straddles block edges: reduce from the map
                    tail_max = fm[
                        :, :, tail_lo * block : (tail_hi + 1) * block
                    ].reshape(batch, n_atoms, tail_nblk, block).max(-1)
                bm = lax.dynamic_update_slice(bm, tail_max, (0, 0, tail_lo))

        if block_argmax:
            # 5) re-reduce only the touched blocks of the max table.
            # (Fusing this into the gram update — computing maxima from
            # the in-register segment — measured ~8% SLOWER end-to-end:
            # the shifted-gram zero-padding costs more than the re-read.)
            ublk0 = jnp.minimum(ustart // block, n_blocks - upd_blocks)

            def fix_blocks(fb, mb, b0):
                seg = lax.dynamic_slice(
                    fb, (0, b0 * block), (n_atoms, upd_blocks * block)
                )
                seg = seg.reshape(n_atoms, upd_blocks, block).max(-1)
                return lax.dynamic_update_slice(mb, seg, (0, b0))

            bm = jax.vmap(fix_blocks)(fm, bm, ublk0)

        return (residual, fm, bm), (atom_index, position, value)

    (residual, _, _), (atom_indices, positions, values) = lax.scan(
        step, (res0, fm0, blockmax0), None, length=n_steps
    )
    return SparseCodeResult(
        atom_indices, positions, values, residual[:, None, :n_samples]
    )
