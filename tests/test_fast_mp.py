"""Fast (incremental-gram) MP engine: exact parity with the naive scan."""

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.sparse import sparse_code, sparse_code_fast, dictionary_gram
from mptpu.ops import unit_norm

RNG = np.random.default_rng(7)


def test_gram_definition():
    d = unit_norm(jnp.asarray(RNG.standard_normal((4, 8)).astype(np.float32)))
    g = np.asarray(dictionary_gram(d))
    dn = np.asarray(d)
    A = 8
    # gram[a, b, A-1+s] = sum_k d[a,k] d[b,k-s]
    for a in range(4):
        for b in range(4):
            for s in [-3, 0, 2]:
                expected = sum(
                    dn[a, k] * dn[b, k - s]
                    for k in range(A)
                    if 0 <= k - s < A
                )
                assert abs(g[a, b, A - 1 + s] - expected) < 1e-4


def test_fast_matches_naive():
    sig = jnp.asarray(RNG.standard_normal((2, 1, 1024)).astype(np.float32))
    d = jnp.asarray(RNG.standard_normal((16, 64)).astype(np.float32))
    a = sparse_code(sig, d, n_steps=12)
    b = sparse_code_fast(sig, d, n_steps=12)
    np.testing.assert_array_equal(
        np.asarray(a.atom_indices), np.asarray(b.atom_indices)
    )
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.residual), np.asarray(b.residual), rtol=1e-3, atol=1e-5
    )


def test_fast_pallas_and_block_argmax_parity():
    """The fused Pallas tail kernel (interpret mode on CPU) and the
    hierarchical block-argmax must reproduce the naive engine exactly.
    Shapes chosen so the Pallas alignment gate passes (atom_size and
    tail offset multiples of the block)."""
    sig = jnp.asarray(RNG.standard_normal((2, 1, 1024)).astype(np.float32))
    d = jnp.asarray(RNG.standard_normal((16, 128)).astype(np.float32))
    a = sparse_code(sig, d, n_steps=10)
    b = sparse_code_fast(
        sig, d, n_steps=10, block=128, block_argmax=True, use_pallas=True
    )
    from mptpu.sparse.fast_mp import PALLAS_AVAILABLE

    assert PALLAS_AVAILABLE
    np.testing.assert_array_equal(
        np.asarray(a.atom_indices), np.asarray(b.atom_indices)
    )
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.residual), np.asarray(b.residual), rtol=1e-3, atol=1e-5
    )


def _assert_same_events(a, b):
    np.testing.assert_array_equal(
        np.asarray(a.atom_indices), np.asarray(b.atom_indices)
    )
    np.testing.assert_array_equal(np.asarray(a.positions), np.asarray(b.positions))
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.residual), np.asarray(b.residual), rtol=1e-3, atol=1e-5
    )


def test_fused_step_kernel_parity():
    """The whole-step fused Pallas kernel (interpret mode on CPU) must
    reproduce the naive engine's event sequence exactly — including the
    table argmax tie-breaking and the boundary-tail recompute."""
    from mptpu.sparse.fast_mp import fused_step_applicable

    sig = jnp.asarray(RNG.standard_normal((2, 1, 1024)).astype(np.float32))
    d = jnp.asarray(RNG.standard_normal((16, 128)).astype(np.float32))
    assert fused_step_applicable(1024, 128, 128, 128, 16)
    a = sparse_code(sig, d, n_steps=10)
    b = sparse_code_fast(sig, d, n_steps=10, block=128, fused=True)
    _assert_same_events(a, b)


def test_fused_step_kernel_boundary_parity():
    """Boundary-clipped events through the fused kernel."""
    d = jnp.asarray(RNG.standard_normal((8, 128)).astype(np.float32))
    du = np.asarray(unit_norm(d))
    sig = np.zeros((1, 1, 512), np.float32)
    sig[0, 0, 448:] = du[2, :64] * 5.0   # clipped plant
    sig[0, 0, 100:228] = du[5] * 3.0     # interior plant
    a = sparse_code(jnp.asarray(sig), d, n_steps=6)
    b = sparse_code_fast(jnp.asarray(sig), d, n_steps=6, block=128, fused=True)
    _assert_same_events(a, b)


def test_fast_boundary_clipping_parity():
    """Events whose atoms clip at the signal end must match the naive
    engine exactly (the gram update alone would be wrong there)."""
    d = jnp.asarray(RNG.standard_normal((8, 32)).astype(np.float32))
    du = np.asarray(unit_norm(d))
    sig = np.zeros((1, 1, 256), np.float32)
    sig[0, 0, 240:] = du[2, :16] * 5.0   # clipped plant
    sig[0, 0, 100:132] = du[5] * 3.0     # interior plant
    a = sparse_code(jnp.asarray(sig), d, n_steps=4)
    b = sparse_code_fast(jnp.asarray(sig), d, n_steps=4)
    np.testing.assert_array_equal(
        np.asarray(a.atom_indices), np.asarray(b.atom_indices)
    )
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )
    np.testing.assert_allclose(
        np.asarray(a.residual), np.asarray(b.residual), rtol=1e-3, atol=1e-5
    )


def test_pipelined_fused_kernel_matches_original():
    """The cross-item-pipelined kernel must be bit-identical to the
    original fused kernel (and hence the naive engine) — including odd
    batch sizes and the B=1 prologue/epilogue edge."""
    d = jnp.asarray(RNG.standard_normal((16, 128)).astype(np.float32))
    for batch in (1, 3, 4):
        sig = jnp.asarray(
            RNG.standard_normal((batch, 1, 1024)).astype(np.float32)
        )
        a = sparse_code_fast(
            sig, d, n_steps=7, block=128, fused=True, pipelined=False
        )
        b = sparse_code_fast(
            sig, d, n_steps=7, block=128, fused=True, pipelined=True
        )
        _assert_same_events(a, b)
        np.testing.assert_array_equal(
            np.asarray(a.residual), np.asarray(b.residual)
        )


def test_gated_tail_recompute_parity():
    """The tail-recompute gate (skip the Hankel/MXU boundary pass for
    interior events — the gram subtract is exact there) must not change
    the event sequence vs the always-recompute kernel, even on
    boundary-heavy signals where the clipped branch fires repeatedly."""
    d = jnp.asarray(RNG.standard_normal((8, 128)).astype(np.float32))
    du = np.asarray(unit_norm(d))
    sig = np.zeros((2, 1, 512), np.float32)
    # several clipped plants at different depths + interior plants
    sig[0, 0, 448:] = du[2, :64] * 5.0
    sig[0, 0, 500:] = sig[0, 0, 500:] + du[4, :12] * 4.0
    sig[0, 0, 100:228] = du[5] * 3.0
    sig[1, 0, 384:] = du[1] * 2.0            # exactly-fitting tail atom
    sig[1, 0, 400:] = sig[1, 0, 400:] + du[7, :112] * 6.0
    sig[1, 0, 0:128] = du[3] * 1.5
    sigj = jnp.asarray(sig)
    naive = sparse_code(sigj, d, n_steps=8)
    for pipelined in (False, True):
        gated = sparse_code_fast(
            sigj, d, n_steps=8, block=128, fused=True,
            pipelined=pipelined, gate_tail=True,
        )
        full = sparse_code_fast(
            sigj, d, n_steps=8, block=128, fused=True,
            pipelined=pipelined, gate_tail=False,
        )
        _assert_same_events(naive, gated)
        _assert_same_events(full, gated)
        # Bit-exactness is NOT expected between the two gate settings:
        # after an interior event the full kernel overwrites the tail
        # feature-map lanes with freshly recomputed dot products while
        # the gated kernel keeps the gram-subtracted values — both are
        # mathematically exact (the gram slice covers every map position
        # for interior events) but round differently at the last ulp,
        # which propagates into later event values. Measured max diffs
        # at this config: residual 4.4e-9, values 1.2e-7.
        np.testing.assert_allclose(
            np.asarray(full.residual),
            np.asarray(gated.residual),
            atol=1e-6,
            rtol=1e-5,
        )


def test_whole_loop_encode_matches_per_step_scan():
    """The whole-encode kernel (grid (n_steps, B), resident VMEM block-max
    tables + residuals, depth-2 prefetch — pallas_fused_mp.
    _whole_loop_kernel) must be bit-identical to the per-step pipelined
    scan, including boundary-clipped events (tail write-backs in flight
    across slot reuse) and the minimum batch (B == depth + 1).

    Signals are PLANTED atom sums with decisive, well-separated maxima
    (iid noise makes cross-engine bit-parity depend on argmax near-ties,
    which flip with last-ulp differences between the two separately
    compiled programs' initial correlations)."""
    d = jnp.asarray(RNG.standard_normal((16, 128)).astype(np.float32))
    du = np.asarray(unit_norm(d))

    def planted(batch):
        sig = np.zeros((batch, 1, 1024), np.float32)
        for i in range(batch):
            for k in range(8):
                pos = (37 + 211 * (i + 1) * (k + 1)) % 896
                sig[i, 0, pos : pos + 128] += du[(3 * i + k) % 16] * (
                    5.0 * 0.8**k
                )
            # one clipped plant so the tail branch fires
            sig[i, 0, -64:] += du[(7 * i) % 16, :64] * 4.0
        return jnp.asarray(sig)

    for batch in (3, 4, 5):
        sigj = planted(batch)
        a = sparse_code_fast(
            sigj, d, n_steps=9, block=128, fused=True, pipelined=True
        )
        b = sparse_code_fast(
            sigj, d, n_steps=9, block=128, fused=True, whole_loop=True
        )
        _assert_same_events(a, b)
        np.testing.assert_array_equal(
            np.asarray(a.residual), np.asarray(b.residual)
        )
        # inner_loop=True runs the SAME g_body as an in-kernel fori_loop
        # over one grid step (no per-grid-step Mosaic dispatch) — must
        # stay bit-identical too
        c = sparse_code_fast(
            sigj, d, n_steps=9, block=128, fused=True, whole_loop=True,
            inner_loop=True,
        )
        _assert_same_events(a, c)
        np.testing.assert_array_equal(
            np.asarray(a.residual), np.asarray(c.residual)
        )
    # batch below depth+1 falls back to the per-step scan (still correct)
    sig1 = planted(2)
    a = sparse_code_fast(sig1, d, n_steps=7, block=128, fused=True)
    b = sparse_code_fast(
        sig1, d, n_steps=7, block=128, fused=True, whole_loop=True
    )
    _assert_same_events(a, b)


def test_lane_table_encode_matches_per_step_scan():
    """The lane-table whole-encode kernel (resident per-block argmax-lane
    table, NO refine DMA — pallas_fused_mp._whole_loop_lane_kernel) must
    be bit-identical to the per-step pipelined scan, including
    boundary-clipped events (the tail branch maintains lanes too) and
    varying prefetch depths. Same planted-signal rationale as
    test_whole_loop_encode_matches_per_step_scan."""
    d = jnp.asarray(RNG.standard_normal((16, 128)).astype(np.float32))
    du = np.asarray(unit_norm(d))

    def planted(batch):
        sig = np.zeros((batch, 1, 1024), np.float32)
        for i in range(batch):
            for k in range(8):
                pos = (53 + 199 * (i + 1) * (k + 1)) % 896
                sig[i, 0, pos : pos + 128] += du[(5 * i + k) % 16] * (
                    5.0 * 0.8**k
                )
            sig[i, 0, -64:] += du[(3 * i + 1) % 16, :64] * 4.0
        return jnp.asarray(sig)

    for batch, depth in ((4, 2), (5, 3)):
        sigj = planted(batch)
        a = sparse_code_fast(
            sigj, d, n_steps=9, block=128, fused=True, pipelined=True
        )
        b = sparse_code_fast(
            sigj, d, n_steps=9, block=128, fused=True, whole_loop=True,
            lane_table=True, depth=depth,
        )
        _assert_same_events(a, b)
        np.testing.assert_array_equal(
            np.asarray(a.residual), np.asarray(b.residual)
        )
