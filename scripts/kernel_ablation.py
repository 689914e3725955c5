"""Phase-cost ablation of the fused pipelined MP kernel on real hardware.

Round 3's profiler trace showed ~99% of the judged encode inside the
pallas kernel body (HBM ~32%, MFU ~7%) but could not say WHICH phase —
Pallas TPU kernels have no in-kernel timers. This script measures each
phase by difference: compile the kernel with one phase ablated
(pallas_fused_mp ``ablate``; numerics intentionally wrong, workload
shape preserved) and compare warm encode time against the full kernel.

Usage:  python scripts/kernel_ablation.py [--batch 32] [--steps 100]
Writes trained_weights/kernel_ablation.json.

Reference hot path being optimized: modules/conv.py:11-53 +
modules/matchingpursuit.py:269-328.
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mptpu.ops.correlation import mp_correlate  # noqa: E402
from mptpu.ops.norms import unit_norm  # noqa: E402
from mptpu.sparse.fast_mp import dictionary_gram  # noqa: E402
from mptpu.sparse.pallas_fused_mp import (  # noqa: E402
    pallas_fused_encode,
    pallas_fused_step_pipelined,
)


def build_inputs(batch: int, n_atoms: int, atom_size: int, n_samples: int, block: int):
    rng = np.random.default_rng(0)
    signal = jnp.asarray(
        rng.standard_normal((batch, 1, n_samples)), jnp.float32
    )
    d2 = unit_norm(
        jnp.asarray(rng.standard_normal((n_atoms, atom_size)), jnp.float32)
    )
    gram = dictionary_gram(d2)
    gram_p = jnp.pad(gram, ((0, 0), (0, 0), (0, 1)))

    pad = ((atom_size - 1 + block - 1) // block) * block
    W = ((n_samples + 2 * pad + block - 1) // block) * block
    right_pad = W - n_samples - pad
    n_blocks = W // block
    NEG = jnp.float32(-1e30)
    fm0 = mp_correlate(signal, d2)
    fm0 = jnp.pad(fm0, ((0, 0), (0, 0), (pad, right_pad)), constant_values=NEG)
    blockmax0 = jnp.max(fm0.reshape(batch, n_atoms, n_blocks, block), axis=-1)
    nb_pad = ((n_blocks + 127) // 128) * 128
    blockmax0 = jnp.pad(
        blockmax0, ((0, 0), (0, 0), (0, nb_pad - n_blocks)), constant_values=-3e38
    )
    res0 = jnp.pad(signal[:, 0, :], ((0, 0), (0, atom_size)))
    upd_blocks = (2 * atom_size - 1 + block - 1) // block + 1
    tail_start = pad + n_samples - atom_size
    static = dict(
        n_samples=n_samples,
        atom_size=atom_size,
        block=block,
        pad=pad,
        n_blocks=n_blocks,
        upd_blocks=upd_blocks,
        tail_start=tail_start,
    )
    return (res0, fm0, blockmax0, d2, gram_p), static


def make_encode(static, n_steps: int, ablate: tuple, interpret: bool = False,
                whole: bool = False, depth: int = 2):
    if whole:
        @jax.jit
        def encode(res0, fm0, bm0, d2, gram_p):
            fm, bm, residual, atoms, poss, vals = pallas_fused_encode(
                fm0, bm0, res0, d2, gram_p,
                n_steps=n_steps, depth=depth, gate_tail=True,
                interpret=interpret, ablate=ablate, **static,
            )
            # depend on everything so no phase is dead-code-eliminated
            return (
                jnp.sum(vals) + jnp.sum(residual[:, ::997])
                + jnp.sum(bm[:, ::97, ::31]) + jnp.sum(atoms) + jnp.sum(poss)
            )

        return encode

    @jax.jit
    def encode(res0, fm0, bm0, d2, gram_p):
        def step(carry, _):
            residual, fm, bm = carry
            fm, bm, residual, atom, pos, val = pallas_fused_step_pipelined(
                fm, bm, residual, d2, gram_p,
                gate_tail=True, interpret=interpret, ablate=ablate, **static,
            )
            return (residual, fm, bm), (atom, pos, val)

        (residual, _, bm), (atoms, poss, vals) = jax.lax.scan(
            step, (res0, fm0, bm0), None, length=n_steps
        )
        # depend on everything so no phase is dead-code-eliminated
        return (
            jnp.sum(vals) + jnp.sum(residual[:, ::997]) + jnp.sum(bm[:, ::97, ::31])
            + jnp.sum(atoms) + jnp.sum(poss)
        )

    return encode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--atoms", type=int, default=512)
    p.add_argument("--atom-size", type=int, default=512)
    p.add_argument("--n-samples", type=int, default=16384)
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--watchdog-s", type=int, default=3000)
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret-mode smoke of every variant at "
                        "whatever (tiny) shape the other flags give")
    p.add_argument(
        "--variants", type=str,
        default="full,gpadzero1,argmax,res,winvpu,windma,bmm",
        help="comma list; 'gram' is off the default set — its ablated "
             "program hit a TPU INTERNAL backend error on the first "
             "on-device run and wedged the relay",
    )
    p.add_argument(
        "--kernel", type=str, default="perstep", choices=("perstep", "whole"),
        help="which engine to ablate: the per-step pipelined kernel under "
             "lax.scan, or the whole-encode kernel (one pallas_call; "
             "phases: argmax, refine, res, winvpu, windma, gramdma, bmm)",
    )
    p.add_argument("--depth", type=int, default=2,
                   help="prefetch depth (whole-encode kernel only)")
    args = p.parse_args()
    faulthandler.dump_traceback_later(args.watchdog_s, exit=True)

    print(f"backend: {jax.default_backend()}", flush=True)
    inputs, static = build_inputs(
        args.batch, args.atoms, args.atom_size, args.n_samples, args.block
    )

    # Compile every variant first, then measure ROUND-ROBIN and take the
    # median per variant: the first on-TPU run measured variants
    # sequentially at reps=1 and the relay's minute-scale drift (+-5 ms)
    # swamped every phase delta (ablating even the 4.5 MB window DMA
    # "saved" negative time).
    names = args.variants.split(",")
    encodes, compile_s = {}, {}
    for name in names:
        ablate = () if name == "full" else tuple(sorted(name.split("+")))
        encodes[name] = make_encode(
            static, args.steps, ablate, args.interpret,
            whole=(args.kernel == "whole"), depth=args.depth,
        )
        t0 = time.perf_counter()
        _ = float(encodes[name](*inputs))  # compile + first run (axon defers)
        compile_s[name] = time.perf_counter() - t0
        print(f"compiled {name} in {compile_s[name]:.1f}s", flush=True)

    times = {name: [] for name in names}
    for r in range(args.reps):
        for name in names:
            t0 = time.perf_counter()
            _ = float(encodes[name](*inputs))
            times[name].append(time.perf_counter() - t0)
        print(f"rep {r}: " + " ".join(
            f"{n}={times[n][-1] * 1e3:.1f}" for n in names), flush=True)

    results = {}
    base_ms = float(np.median(times["full"])) * 1e3 if "full" in times else None
    for name in names:
        ms = float(np.median(times[name])) * 1e3
        delta = (base_ms - ms) if base_ms is not None else float("nan")
        results[name] = {
            "ms": round(ms, 2),
            "ms_all": [round(t * 1e3, 2) for t in times[name]],
            "compile_s": round(compile_s[name], 1),
            "saved_ms_vs_full": round(delta, 2),
        }
        print(
            f"{name:>12}: {ms:8.2f} ms/encode median"
            f"  (saves {delta:6.2f} ms vs full; compile {compile_s[name]:.1f}s)",
            flush=True,
        )

    out_path = os.path.join(
        "trained_weights",
        "kernel_ablation.json" if args.kernel == "perstep"
        else "kernel_ablation_whole.json",
    )
    os.makedirs("trained_weights", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "config": vars(args),
                "backend": jax.default_backend(),
                "results": results,
            },
            f, indent=2,
        )
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
