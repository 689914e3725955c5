"""Device mesh + sharding helpers.

The standard recipe: build a Mesh over the ICI, annotate shardings with
NamedSharding/PartitionSpec, let XLA insert collectives. Axes:
  'data'  — batch-parallel training (grads psum over ICI)
  'dict'  — atom-sharded matching pursuit (argmax allreduce)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over all (or given) devices; default one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n_needed = int(np.prod(axis_sizes))
    if len(devices) < n_needed:
        raise ValueError(
            f"make_mesh: axis_sizes {tuple(axis_sizes)} needs {n_needed} "
            f"devices but only {len(devices)} are available. On a "
            "single-chip host, bootstrap a virtual CPU mesh first: set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_needed} "
            "and jax.config.update('jax_platforms', 'cpu') before any "
            "device query (see tests/conftest.py)."
        )
    arr = np.asarray(devices[:n_needed]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
