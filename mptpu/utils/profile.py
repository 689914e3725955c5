"""Profiler-trace capture + utilization accounting (SURVEY §5: the
TPU-native replacement for the reference's nonexistent profiling story —
the reference's only perf knobs are ``cudnn.benchmark`` and AMP,
``current.py:16``, ``iterativedecomposition.py:384``).

``trace`` wraps ``jax.profiler.trace`` so any hot region can be captured
to a TensorBoard-loadable directory; ``utilization`` turns a measured
wall time + hand-counted FLOPs/bytes into MFU / HBM-bandwidth-utilization
figures against the chip's peaks.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass
from typing import Iterator, Optional

# v5e (TPU v5 lite) single-chip peaks; override for other parts.
V5E_PEAK_BF16_FLOPS = 394e12  # MXU peak, bf16
V5E_PEAK_F32_FLOPS = 98.5e12  # f32 (1/4 of bf16 on v5e MXU)
V5E_HBM_BYTES_PER_S = 819e9  # 819 GB/s HBM bandwidth


@contextlib.contextmanager
def trace(
    log_dir: str = "trained_weights/profile",
    create_perfetto_link: bool = False,
) -> Iterator[str]:
    """Capture a ``jax.profiler`` trace of the enclosed block.

    The trace lands under ``log_dir`` (one timestamped subdirectory per
    capture) and loads in TensorBoard's profile plugin / Perfetto.
    Usage::

        with profile.trace("trained_weights/profile") as d:
            coder(sig, dictionary).values.block_until_ready()
        print("trace in", d)
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield log_dir


@dataclass
class Utilization:
    """Achieved vs peak for a measured region."""

    wall_s: float
    flops: float
    bytes_moved: float
    mfu: float
    hbm_util: float

    def __str__(self) -> str:
        return (
            f"{self.wall_s*1e3:.2f} ms: "
            f"{self.flops / self.wall_s / 1e12:.2f} TFLOP/s "
            f"(MFU {self.mfu*100:.1f}%), "
            f"{self.bytes_moved / self.wall_s / 1e9:.1f} GB/s "
            f"(HBM {self.hbm_util*100:.1f}%)"
        )


def utilization(
    wall_s: float,
    flops: float = 0.0,
    bytes_moved: float = 0.0,
    peak_flops: float = V5E_PEAK_F32_FLOPS,
    peak_bytes_per_s: float = V5E_HBM_BYTES_PER_S,
) -> Utilization:
    """Compute MFU and HBM-bandwidth utilization for a measured region.

    ``flops`` / ``bytes_moved`` are per-invocation analytical counts (the
    honest way on this backend, where the profiler's device-side counters
    ride a remote relay); ``wall_s`` is the measured warm steady-state
    time with a forced device->host transfer (BENCHMARKS.md methodology).
    """
    return Utilization(
        wall_s=wall_s,
        flops=flops,
        bytes_moved=bytes_moved,
        mfu=(flops / wall_s) / peak_flops if flops else 0.0,
        hbm_util=(bytes_moved / wall_s) / peak_bytes_per_s
        if bytes_moved
        else 0.0,
    )


def timed(fn, *args, sync=lambda out: float(out.sum()), repeats: int = 3):
    """Best-of-``repeats`` wall time of ``fn(*args)`` with a forced
    device->host transfer (``block_until_ready`` under-reports on the
    axon relay — see CLAUDE.md)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best
