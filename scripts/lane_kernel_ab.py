"""A/B the lane-table whole-encode kernel against the round-4 judged
whole-encode kernel at the judged bench config (VERDICT r4 item 4 /
ROADMAP item 3: the whole-encode kernel is VPU/latency-bound ~3x off its
HBM bound; `_whole_loop_lane_kernel` keeps the per-block argmax LANE
resident so the per-(item, step) refine DMA round trip disappears).

Runs both kernels on iid noise at the judged config (512 atoms x 512
taps, 16k samples, 100 steps, batch 32, block 128), reports per-encode
wall time (best of 5 after warm), atoms/sec, and on-device equivalence
by the parity-probe measures (final residual energy gap, first
selection divergence + score gap — see kernel_parity_probe.py for why
exact-index parity is tie-fragile across separately compiled programs).

Run in the background to completion (never under `timeout`).
"""

import faulthandler
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env, enable_compilation_cache

apply_platform_from_env()
enable_compilation_cache()

faulthandler.dump_traceback_later(3000, exit=True)

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.sparse import sparse_code_fast

n_atoms, atom_size, n_samples, n_steps, batch = 512, 512, 16384, 100, 32
block = 128
if "--block" in sys.argv:
    block = int(sys.argv[sys.argv.index("--block") + 1])

rng = np.random.default_rng(0)
d = jnp.asarray(rng.standard_normal((n_atoms, atom_size)).astype(np.float32))
sig = jnp.asarray(rng.standard_normal((batch, 1, n_samples)).astype(np.float32))

arms = {
    "whole": dict(fused=True, whole_loop=True, block=block),
    "lane": dict(fused=True, whole_loop=True, lane_table=True, block=block),
}

report = {"config": f"{n_atoms}x{atom_size}, {n_samples} samples, "
                    f"{n_steps} steps, batch {batch}, block {block}"}
results = {}
for name, kw in arms.items():
    coder = jax.jit(lambda s, dd, kw=kw: sparse_code_fast(
        s, dd, n_steps=n_steps, **kw))
    t0 = time.perf_counter()
    out = coder(sig, d)
    # axon defers past block_until_ready; force device->host
    float(out.values.sum())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = coder(sig, d)
        float(out.values.sum())
        best = min(best, time.perf_counter() - t0)
    results[name] = out
    report[name] = {
        "compile_s": round(compile_s, 1),
        "best_encode_ms": round(best * 1e3, 2),
        "atoms_per_sec": round(n_steps * batch / best, 1),
    }

a, b = results["whole"], results["lane"]
sig_e = np.asarray(jnp.sum(sig**2, axis=(1, 2)))
ra = np.asarray(jnp.sum(a.residual**2, axis=(1, 2)))
rb = np.asarray(jnp.sum(b.residual**2, axis=(1, 2)))
idx_a, idx_b = np.asarray(a.atom_indices).T, np.asarray(b.atom_indices).T
pos_a, pos_b = np.asarray(a.positions).T, np.asarray(b.positions).T
val_a, val_b = np.asarray(a.values).T, np.asarray(b.values).T
diverged = (idx_a != idx_b) | (pos_a != pos_b)
first_div = np.where(diverged.any(axis=1), diverged.argmax(axis=1), n_steps)
gap_db = []
for i in range(batch):
    s = int(first_div[i])
    if s < n_steps:
        va, vb = abs(float(val_a[i, s])), abs(float(val_b[i, s]))
        gap_db.append(20 * np.log10(max(va, vb) / max(min(va, vb), 1e-12)))
report["parity"] = {
    "items_with_any_divergence": int(diverged.any(axis=1).sum()),
    "median_first_divergence_step": float(np.median(first_div)),
    "max_pick_score_gap_db": round(max(gap_db), 4) if gap_db else 0.0,
    "max_rel_final_residual_energy_gap": float(
        (np.abs(ra - rb) / sig_e).max()),
}
report["speedup_lane_vs_whole"] = round(
    report["whole"]["best_encode_ms"] / report["lane"]["best_encode_ms"], 3)

out_path = "trained_weights/lane_kernel_ab.json"
with open(out_path, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report, indent=1), flush=True)
print("wrote", out_path, flush=True)
