"""Microprobe: what does one Mosaic grid step COST on this chip?

The round-4 phase ablation (trained_weights/kernel_ablation.json) left
~49 ms of the 91 ms whole-encode unattributed after every ablatable
phase was subtracted — ~15 us per (item, step) grid iteration. Two
hypotheses:

  (a) per-grid-step dispatch/bookkeeping overhead in the Mosaic
      sequential-grid machinery — would mean moving the greedy loop
      into an in-kernel ``lax.fori_loop`` (grid=(1,)) reclaims it;
  (b) true serialization of the step's dependency chain (argmax reduce
      latency -> refine DMA -> surgery) that no grid restructure fixes.

This probe separates them with kernels that do NOTHING but iterate:

  grid3200   — grid=(3200,), body writes program_id to SMEM
  fori3200   — grid=(1,), lax.fori_loop(3200) writing to SMEM
  grid3200v  — grid=(3200,), body also does one 8x128 VPU op (so the
               step is not optimized to nothing)
  fori3200v  — fori_loop equivalent

If grid3200v - fori3200v ~ 45 ms, hypothesis (a): the whole-encode
kernel should be restructured around an in-kernel loop. If both are
~free, the base is (b) and the 45k atoms/sec goal needs the dependency
chain itself shortened.

Usage: python scripts/grid_overhead_probe.py  (TPU; run in background
to completion, never under `timeout`).
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

faulthandler.dump_traceback_later(1800, exit=True)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 3200
INTERPRET = jax.devices()[0].platform == "cpu"


def _grid_kernel(o_ref, acc_ref, *, vpu: bool):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[:, :] = jnp.zeros((8, 128), jnp.float32)

    if vpu:
        acc_ref[:, :] = acc_ref[:, :] * 1.000001 + 1.0

    @pl.when(g == STEPS - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :]


def _fori_kernel(o_ref, acc_ref, *, vpu: bool):
    acc_ref[:, :] = jnp.zeros((8, 128), jnp.float32)

    def body(i, _):
        if vpu:
            acc_ref[:, :] = acc_ref[:, :] * 1.000001 + 1.0
        return 0

    jax.lax.fori_loop(0, STEPS, body, 0)
    o_ref[:, :] = acc_ref[:, :]


def make(kind: str, vpu: bool):
    from functools import partial

    if kind == "grid":
        kernel, grid = partial(_grid_kernel, vpu=vpu), (STEPS,)
    else:
        kernel, grid = partial(_fori_kernel, vpu=vpu), (1,)
    return jax.jit(
        lambda: pl.pallas_call(
            kernel,
            grid=grid,
            out_specs=pl.BlockSpec((8, 128), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            interpret=INTERPRET,
            compiler_params=(
                pltpu.CompilerParams(has_side_effects=True)
                if not INTERPRET else None
            ),
        )()
    )


print(f"backend: {jax.devices()[0].platform}", flush=True)
results = {}
for name, kind, vpu in [
    ("grid3200", "grid", False),
    ("fori3200", "fori", False),
    ("grid3200v", "grid", True),
    ("fori3200v", "fori", True),
]:
    fn = make(kind, vpu)
    t0 = time.perf_counter()
    float(fn().sum())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn().sum())
        best = min(best, time.perf_counter() - t0)
    per_step_us = best * 1e6 / STEPS
    results[name] = {
        "ms": round(best * 1e3, 3),
        "us_per_step": round(per_step_us, 3),
        "compile_s": round(compile_s, 1),
    }
    print(f"{name}: {best*1e3:.3f} ms total, {per_step_us:.3f} us/step "
          f"(compile {compile_s:.1f}s)", flush=True)

os.makedirs("trained_weights", exist_ok=True)
with open("trained_weights/grid_overhead_probe.json", "w") as f:
    json.dump({"steps": STEPS, "results": results}, f, indent=1)
print("wrote trained_weights/grid_overhead_probe.json", flush=True)
