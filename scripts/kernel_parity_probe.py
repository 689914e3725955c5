"""On-device parity probe for the whole-encode fused MP kernel.

fused_kernel_bench.py's strict parity line (exact argmax indices over
100 greedy steps on iid noise) is tie-fragile: two separately compiled
programs (per-step scan vs whole-encode pallas_call) round the initial
correlations differently in the last ulp, and an argmax near-tie then
flips one selection, after which every later pick diverges — with NO
quality difference. tests/test_fast_mp.py proves bit-exactness on
decisive planted signals (CPU interpret); this probe proves on-device
EQUIVALENCE on the judged iid-noise config by the measures that matter:

- final residual energy (the greedy objective) per item,
- total removed energy,
- the step index of first selection divergence + the correlation-score
  gap there (a true bug shows a LARGE gap; a tie-flip shows ~ulp).

Run in the background to completion (never under `timeout`).
"""

import faulthandler
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env

apply_platform_from_env()

import numpy as np

faulthandler.dump_traceback_later(2400, exit=True)

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
import jax.numpy as jnp

from mptpu.ops import unit_norm
from mptpu.sparse import sparse_code_fast

n_atoms, atom_size, n_samples, n_steps, batch = 512, 512, 16384, 100, 32
# optional: probe the whole-encode kernel at a non-default block size
# (e.g. --block 128, the round-4 sweep winner bench.py now runs);
# the per-step reference arm stays at the default block so the probe
# ALSO covers cross-block-size equivalence
blk = 512
if "--block" in sys.argv:
    blk = int(sys.argv[sys.argv.index("--block") + 1])
# --lane: probe the lane-table whole-encode kernel (resident argmax-lane
# table, pallas_fused_mp._whole_loop_lane_kernel) instead of the plain
# whole-encode kernel
use_lane = "--lane" in sys.argv
depth = 2
if "--depth" in sys.argv:
    depth = int(sys.argv[sys.argv.index("--depth") + 1])
rng = np.random.default_rng(0)
d = jnp.asarray(rng.standard_normal((n_atoms, atom_size)).astype(np.float32))
sig = jnp.asarray(rng.standard_normal((batch, 1, n_samples)).astype(np.float32))

a = sparse_code_fast(sig, d, n_steps=n_steps, fused=True, pipelined=True)
b = sparse_code_fast(
    sig, d, n_steps=n_steps, fused=True, whole_loop=True, gate_tail=True,
    block=blk, lane_table=use_lane, depth=depth,
)
jax.block_until_ready((a.residual, b.residual))

sig_e = np.asarray(jnp.sum(sig**2, axis=(1, 2)))
ra = np.asarray(jnp.sum(a.residual**2, axis=(1, 2)))
rb = np.asarray(jnp.sum(b.residual**2, axis=(1, 2)))
# SparseCodeResult event arrays are (n_steps, batch) — see
# mptpu/sparse/matching_pursuit.py:45 — transpose to (batch, n_steps)
# so the per-item reductions below reduce over STEPS. (The original
# probe reduced over the wrong axis; at block 512 every entry was
# identical so the bug was invisible, but a cross-block run counted
# per-STEP divergence and paired val_a[step, item] mismatches into a
# spurious 0.27 dB "score gap".)
idx_a = np.asarray(a.atom_indices).T
idx_b = np.asarray(b.atom_indices).T
pos_a = np.asarray(a.positions).T
pos_b = np.asarray(b.positions).T
val_a = np.asarray(a.values).T
val_b = np.asarray(b.values).T

# per-item first step where the two engines picked different events
diverged = (idx_a != idx_b) | (pos_a != pos_b)
first_div = np.where(
    diverged.any(axis=1), diverged.argmax(axis=1), n_steps
)
# correlation score at the divergence step: the greedy pick's |value| —
# a tie-flip means both engines removed ~the same amount of energy there
gap_db = []
for i in range(batch):
    s = first_div[i]
    if s < n_steps:
        va, vb = abs(float(val_a[i, s])), abs(float(val_b[i, s]))
        gap_db.append(20 * np.log10(max(va, vb) / max(min(va, vb), 1e-12)))

rel_energy_gap = np.abs(ra - rb) / sig_e
report = {
    "whole_loop_block": blk,
    "lane_table": use_lane,
    "depth": depth,
    "items": int(batch),
    "items_with_any_divergence": int(diverged.any(axis=1).sum()),
    "median_first_divergence_step": float(np.median(first_div)),
    "max_pick_score_gap_db_at_divergence": (
        round(max(gap_db), 4) if gap_db else 0.0
    ),
    "median_pick_score_gap_db_at_divergence": (
        round(float(np.median(gap_db)), 4) if gap_db else 0.0
    ),
    "max_rel_final_residual_energy_gap": float(rel_energy_gap.max()),
    "mean_residual_energy_ratio_b_over_a": float((rb / ra).mean()),
    "equivalent": bool(
        rel_energy_gap.max() < 1e-3
        and (not gap_db or max(gap_db) < 0.1)
    ),
}
print(json.dumps(report, indent=1), flush=True)
os.makedirs("trained_weights", exist_ok=True)
suffix = "" if blk == 512 else f"_b{blk}"
with open(f"trained_weights/kernel_parity_probe{suffix}.json", "w") as f:
    json.dump(report, f, indent=1)
