"""Block-size sweep for the fused MP kernels on the judged config.

The update window spans ``ceil((2A-1)/block) + 1`` aligned blocks, so at
the judged config (A = 512) the default ``block=512`` moves a 1536-lane
window through VMEM per (item, step) while the true update region is
only 1023 lanes: ``block=128`` shrinks the window to 1152 lanes (-25%
window DMA *and* VPU subtract work — the two largest measured phases,
trained_weights/kernel_ablation.json: windma 26%, winvpu 9%), at the
cost of a wider block-max table (136 -> padded 256 lanes). ``block=256``
is the middle point whose table still fits one 128-lane pad.

Selections and values are bit-identical across block sizes (the
block-max argmax preserves first-flat-index semantics at any
granularity); this script re-verifies that on device against the
unfused XLA engine.

Usage: python scripts/kernel_block_sweep.py   (TPU; run in background
to completion, never under `timeout`). Writes
trained_weights/kernel_block_sweep.json.

Reference hot path being optimized: modules/conv.py:11-53 +
modules/matchingpursuit.py:269-328.
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env, enable_compilation_cache

apply_platform_from_env()
enable_compilation_cache()

faulthandler.dump_traceback_later(7200, exit=True)

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.sparse import sparse_code_fast

n_atoms, atom_size, n_samples, n_steps, batch = 512, 512, 16384, 100, 32
rng = np.random.default_rng(0)
d = jnp.asarray(rng.standard_normal((n_atoms, atom_size)).astype(np.float32))
sig = jnp.asarray(rng.standard_normal((batch, 1, n_samples)).astype(np.float32))

print(f"backend: {jax.devices()[0].platform}", flush=True)

# ground truth: the per-step non-fused XLA engine (block argmax, any block)
ref = jax.jit(
    lambda s, dd: sparse_code_fast(s, dd, n_steps=n_steps, fused=False)
)(sig, d)
float(ref.values.sum())

results = {}
base_out = None
VARIANTS = [
    ("lane128", dict(block=128, whole_loop=True, lane_table=True, depth=2)),
    ("lane128d6", dict(block=128, whole_loop=True, lane_table=True, depth=6)),
    ("lane256", dict(block=256, whole_loop=True, lane_table=True, depth=2)),
    ("lane512", dict(block=512, whole_loop=True, lane_table=True, depth=2)),
    ("whole128", dict(block=128, whole_loop=True, depth=2)),
    ("whole256", dict(block=256, whole_loop=True, depth=2)),
    ("whole512", dict(block=512, whole_loop=True, depth=2)),
    # in-kernel fori_loop over ONE grid step (grid-dispatch overhead
    # hypothesis — see scripts/grid_overhead_probe.py)
    ("whole128fori", dict(block=128, whole_loop=True, depth=2,
                          inner_loop=True)),
]
# SWEEP_ONLY=name1,name2 narrows the run (e.g. a contention-matched A/B
# in a short TPU window between training runs); the JSON then MERGES
# into any existing sweep file instead of replacing it
only = os.environ.get("SWEEP_ONLY", "")
if only:
    keep = {n.strip() for n in only.split(",") if n.strip()}
    VARIANTS = [(n, kw) for n, kw in VARIANTS if n in keep]
    print(f"SWEEP_ONLY -> {[n for n, _ in VARIANTS]}", flush=True)
for name, kw in VARIANTS:
    coder = jax.jit(
        lambda s, dd, kw=kw: sparse_code_fast(
            s, dd, n_steps=n_steps, fused=True, **kw
        )
    )
    t0 = time.perf_counter()
    try:
        out = coder(sig, d)
        float(out.values.sum())
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        results[name] = {"error": f"{type(e).__name__}: {e}"}
        continue
    compile_s = time.perf_counter() - t0
    best = float("inf")
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = coder(sig, d)
        float(out.values.sum())
        times.append(time.perf_counter() - t0)
        best = min(best, times[-1])
    aps = n_steps * batch / best

    def same(x, y):
        return (
            np.array_equal(np.asarray(x.atom_indices), np.asarray(y.atom_indices))
            and np.array_equal(np.asarray(x.positions), np.asarray(y.positions))
            and np.allclose(np.asarray(x.values), np.asarray(y.values), rtol=1e-5)
            and np.allclose(
                np.asarray(x.residual), np.asarray(y.residual),
                rtol=1e-4, atol=1e-5,
            )
        )

    # vs the XLA engine (may flip on iid-noise argmax near-ties between
    # separately compiled programs) AND vs the first fused variant (the
    # bit-parity that must hold)
    parity = same(ref, out)
    if base_out is None:
        base_out = out
    parity_fused = same(base_out, out)
    results[name] = {
        "ms": round(best * 1e3, 2),
        "ms_all": [round(t * 1e3, 2) for t in times],
        "atoms_per_sec": round(aps),
        "compile_s": round(compile_s, 1),
        "parity_vs_xla": bool(parity),
        "parity_vs_first_fused": bool(parity_fused),
    }
    print(
        f"{name}: compile {compile_s:.1f}s, best {best*1e3:.1f} ms, "
        f"{aps:,.0f} atoms/sec, parity xla={parity} fused={parity_fused}",
        flush=True,
    )

os.makedirs("trained_weights", exist_ok=True)
out_path = "trained_weights/kernel_block_sweep.json"
merged = results
if only and os.path.exists(out_path):
    try:
        with open(out_path) as f:
            prior = json.load(f).get("results", {})
        prior.update(results)
        merged = prior
    except Exception:
        pass
with open(out_path, "w") as f:
    json.dump(
        {
            "config": dict(
                batch=batch, atoms=n_atoms, atom_size=atom_size,
                n_samples=n_samples, steps=n_steps,
            ),
            "results": merged,
        },
        f,
        indent=2,
    )
print("wrote trained_weights/kernel_block_sweep.json", flush=True)
