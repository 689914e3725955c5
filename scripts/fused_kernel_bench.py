"""A/B the fused MP kernel generations on the judged config (512x512
dict, 16k samples, 100 steps, batch 32): round-2 per-step, round-3
pipelined/gated, round-4 whole-encode (resident VMEM state) at prefetch
depths 2 and 3. Run in the background to completion (never under
`timeout`)."""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np

faulthandler.dump_traceback_later(4000, exit=True)

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
import jax.numpy as jnp
from mptpu.sparse import sparse_code_fast

n_atoms, atom_size, n_samples, n_steps, batch = 512, 512, 16384, 100, 32
rng = np.random.default_rng(0)
d = jnp.asarray(rng.standard_normal((n_atoms, atom_size)).astype(np.float32))
if "--audio" in sys.argv:
    # synthetic-audio signals: the tail-recompute gate's win depends on
    # how often the greedy argmax lands within atom_size of the signal
    # end, which is workload-dependent — characterize both
    from mptpu.data import AudioIterator

    sig = next(iter(AudioIterator(batch, n_samples, normalize=True, seed=0)))
    signal_kind = "synthetic audio"
else:
    sig = jnp.asarray(
        rng.standard_normal((batch, 1, n_samples)).astype(np.float32)
    )
    signal_kind = "iid noise"
print(f"signal: {signal_kind}", flush=True)

results = {}
VARIANTS = (
    # (name, pipelined, gate_tail, whole_loop, depth)
    ("original", False, False, False, 2),
    ("pipelined", True, False, False, 2),
    ("gated", False, True, False, 2),
    ("gated-pipelined", True, True, False, 2),
    ("whole-loop", True, True, True, 2),
    ("whole-loop-d3", True, True, True, 3),
)
for name, pipelined, gate, whole, depth in VARIANTS:
    coder = jax.jit(
        lambda s, dd, p=pipelined, g=gate, w=whole, dp=depth: sparse_code_fast(
            s, dd, n_steps=n_steps, fused=True, pipelined=p, gate_tail=g,
            whole_loop=w, depth=dp,
        )
    )
    t0 = time.perf_counter()
    out = coder(sig, d)
    float(out.values.sum())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = coder(sig, d)
        float(out.values.sum())
        best = min(best, time.perf_counter() - t0)
    aps = n_steps * batch / best
    results[name] = out
    print(
        f"{name}: compile {compile_s:.1f}s, best {best*1e3:.1f} ms/encode, "
        f"{aps:,.0f} atoms/sec",
        flush=True,
    )

a = results["original"]
clip_rate = float(
    np.mean(np.asarray(a.positions) > n_samples - atom_size)
)
print(
    f"clipped-event rate: {clip_rate:.1%} "
    "(the gated variants skip the tail recompute for the rest)",
    flush=True,
)
for name, *_ in VARIANTS[1:]:
    b = results[name]
    same = (
        np.array_equal(np.asarray(a.atom_indices), np.asarray(b.atom_indices))
        and np.array_equal(np.asarray(a.positions), np.asarray(b.positions))
        and np.allclose(np.asarray(a.values), np.asarray(b.values), rtol=1e-5)
        and np.allclose(
            np.asarray(a.residual), np.asarray(b.residual), rtol=1e-4, atol=1e-5
        )
    )
    print(f"on-device parity original vs {name}: {same}", flush=True)
