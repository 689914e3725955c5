"""Capture ``jax.profiler`` traces for the two hot paths (SURVEY §5's
tracing story; VERDICT r2 item 8) and print analytical MFU / HBM
utilization for the fused MP kernel.

Captures:
  1. the fused Pallas MP encode at the judged bench config
     (512 atoms x 512 taps, 16k samples, 100 steps, batch 32);
  2. the SIAM reconstruct forward at the full 2^17/32-event config
     (shares the overfit trainer's compile cache).

Traces land in ``trained_weights/profile/<name>`` (TensorBoard profile
plugin / Perfetto loadable). Run on the TPU in the background to
completion (never under ``timeout``)."""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.utils import profile


def mp_bytes_per_item_step(
    n_atoms: int, atom_size: int, n_samples: int, block: int
) -> float:
    """Analytical HBM bytes moved per (item, step) by the fused kernel
    (mptpu/sparse/pallas_fused_mp.py DMA inventory; BENCHMARKS.md
    'speed-of-light' section)."""
    A, N = atom_size, n_atoms
    pad = ((A - 1 + block - 1) // block) * block
    W = pad + ((n_samples + pad + block - 1) // block) * block
    n_blocks = W // block
    nb_pad = ((n_blocks + 127) // 128) * 128
    upd_w = ((2 * A - 1 + block - 1) // block + 1) * block
    L = n_samples + A
    f = 4  # float32
    return (
        2 * N * nb_pad * f       # block-max table read + write
        + 8 * block * f          # winner refine rows
        + N * 2 * A * f          # gram row read
        + 2 * L * f              # residual read + write
        + 2 * N * upd_w * f      # feature-map window read + write
        + N * A * f              # boundary-tail write
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="trained_weights/profile")
    p.add_argument("--skip-siam", action="store_true")
    p.add_argument("--pipelined", action="store_true", default=True)
    p.add_argument("--no-pipelined", dest="pipelined", action="store_false")
    args = p.parse_args()

    faulthandler.dump_traceback_later(3600, exit=True)
    os.makedirs(args.out, exist_ok=True)

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from mptpu.sparse import sparse_code_fast

    n_atoms, atom_size, n_samples, n_steps, batch = 512, 512, 16384, 100, 32
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal((n_atoms, atom_size)), jnp.float32)
    sig = jnp.asarray(
        rng.standard_normal((batch, 1, n_samples)), jnp.float32
    )
    coder = jax.jit(
        lambda s, d: sparse_code_fast(
            s, d, n_steps=n_steps, fused=True, pipelined=args.pipelined
        )
    )
    float(coder(sig, d).values.sum())  # compile + warm

    wall = profile.timed(
        coder, sig, d, sync=lambda out: float(out.values.sum())
    )
    block = 512  # fast_mp's default block at this config
    with profile.trace(os.path.join(args.out, "fused_mp")) as tdir:
        float(coder(sig, d).values.sum())
    print(f"fused MP trace in {tdir}", flush=True)

    per_item_step = wall / (batch * n_steps)
    bytes_moved = mp_bytes_per_item_step(
        n_atoms, atom_size, n_samples, block
    ) * batch * n_steps
    # the only MXU work is the (N, A) x (A, A) boundary-tail matmul
    flops = 2 * n_atoms * atom_size * atom_size * batch * n_steps
    util = profile.utilization(wall, flops=flops, bytes_moved=bytes_moved)
    report = {
        "fused_mp": {
            "wall_s": round(wall, 4),
            "us_per_item_step": round(per_item_step * 1e6, 2),
            "mfu_pct": round(util.mfu * 100, 2),
            "hbm_util_pct": round(util.hbm_util * 100, 2),
            "hbm_speed_of_light_us": round(
                mp_bytes_per_item_step(n_atoms, atom_size, n_samples, block)
                / profile.V5E_HBM_BYTES_PER_S * 1e6, 2,
            ),
            "pipelined": args.pipelined,
        }
    }
    print(json.dumps(report["fused_mp"]), flush=True)

    if not args.skip_siam:
        from mptpu.models.siam import SIAMModel, make_iterative_fn

        model = SIAMModel(
            n_samples=2**17, context_dim=32, in_channels=1025,
            hidden_channels=128, n_events=32,
            transform_window_size=2048, transform_step_size=256,
            fft_resonance=True, attn_floor=0.01, attn_leak=0.1,
            switch_clamp=20.0, residual_clamp_scale=4.0,
            encoder_clamp=1e4,
        )
        key = jax.random.PRNGKey(0)
        target = jnp.asarray(
            rng.standard_normal((1, 1, 2**17)), jnp.float32
        )
        params = jax.jit(model.init)(key, target, key)
        iterative = make_iterative_fn(model)

        @jax.jit
        def forward(params, key):
            channels, _, _, _ = iterative(params, target, key)
            return jnp.sum(channels, axis=1, keepdims=True)

        float(forward(params, key).sum())  # compile + warm
        wall = profile.timed(
            forward, params, key, sync=lambda out: float(out.sum())
        )
        with profile.trace(os.path.join(args.out, "siam_forward")) as tdir:
            float(forward(params, key).sum())
        print(f"SIAM forward trace in {tdir}", flush=True)
        report["siam_forward"] = {"wall_s": round(wall, 4)}
        print(json.dumps(report["siam_forward"]), flush=True)

    with open(os.path.join(args.out, "utilization.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
