"""Gammatone FIR filter bank (reference ``modules/gammatone.py:10-47``).

Filters are built host-side with scipy at trace time (static shapes) and
used as a jax constant; the filtering itself is ``mptpu.ops.fft_convolve``.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np
import jax.numpy as jnp
from scipy.signal import gammatone


def gammatone_filter_bank(
    n_filters: int,
    size: int,
    start_hz: float = 20,
    stop_hz: float = 11000,
    samplerate: int = 22050,
    band_spacing: Union[str, Sequence[float]] = "linear",
) -> jnp.ndarray:
    """(n_filters, size) max-normalized 4th-order gammatone FIRs."""
    if band_spacing == "linear":
        frequencies = np.linspace(start_hz, stop_hz, num=n_filters)
    elif band_spacing == "geometric":
        frequencies = np.geomspace(start_hz, stop_hz, num=n_filters)
    elif hasattr(band_spacing, "__getitem__"):
        frequencies = np.asarray(band_spacing)
    else:
        raise ValueError(
            f"{band_spacing} is not a valid band_spacing value, "
            "please choose linear or geometric"
        )

    bank = np.zeros((n_filters, size))
    for i, freq in enumerate(frequencies):
        b, _ = gammatone(
            freq=freq, ftype="fir", order=4, numtaps=size, fs=samplerate
        )
        bank[i] = b
    bank = bank / np.abs(bank).max(axis=-1, keepdims=True)
    return jnp.asarray(bank, dtype=jnp.float32)
