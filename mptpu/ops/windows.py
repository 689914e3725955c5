"""Window functions (static, computed at trace time)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hann_window(size: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Hann window.

    ``periodic=True`` matches ``torch.hann_window`` /
    ``scipy.signal.windows.hann(size, sym=False)`` — the COLA-satisfying
    form used by the reference's STFT (``modules/stft.py:22``) and
    overlap-add (``modules/overlap_add.py:10``).
    """
    n = size + 1 if not periodic else size
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
    if not periodic:
        w = w[:size] if size == 1 else (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(size) / (size - 1)))
    return jnp.asarray(w[:size], dtype=dtype)


def hamming_window(size: int, periodic: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    denom = size if periodic else size - 1
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(size) / denom)
    return jnp.asarray(w, dtype=dtype)
