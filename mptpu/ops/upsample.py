"""Upsampling ops: zero-stuffing, N-d linear interpolation, length padding,
FFT-domain upsampling.

Parity with reference ``modules/upsample.py:12-48`` and
``FFTUpsampleBlock.upsample`` (``:118-138``). ``interpolate_last_axis``
reproduces torch ``F.interpolate`` semantics (linear: align_corners=False;
nearest: floor index) over arbitrary leading dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from .fft import rfft as _rfft, irfft as _irfft


def upsample_with_holes(low_sr: jax.Array, desired_size: int) -> jax.Array:
    """Place samples at fixed intervals with zeros in between
    (reference ``upsample.py:12-19``)."""
    factor = desired_size // low_sr.shape[-1]
    # zero-stuff by stacking a zeros block after each sample then flattening —
    # a reshape, not a scatter, so XLA fuses it.
    stuffed = jnp.concatenate(
        [
            low_sr[..., None],
            jnp.zeros(low_sr.shape + (factor - 1,), dtype=low_sr.dtype),
        ],
        axis=-1,
    ).reshape(low_sr.shape[:-1] + (low_sr.shape[-1] * factor,))
    if stuffed.shape[-1] < desired_size:
        pad = desired_size - stuffed.shape[-1]
        stuffed = jnp.pad(
            stuffed, [(0, 0)] * (stuffed.ndim - 1) + [(0, pad)]
        )
    return stuffed[..., :desired_size]


def interpolate_last_axis(
    low_sr: jax.Array, desired_size: int, mode: str = "linear"
) -> jax.Array:
    """Interpolate along the last axis, any number of leading dims
    (reference ``upsample.py:22-33``)."""
    n = low_sr.shape[-1]
    if mode == "nearest":
        idx = (jnp.arange(desired_size) * n) // desired_size
        return low_sr[..., idx]
    if mode != "linear":
        raise ValueError(f"unsupported mode: {mode}")
    scale = n / desired_size
    # torch align_corners=False source coordinate
    coords = (jnp.arange(desired_size) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, n - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = (coords - lo).astype(low_sr.dtype)
    return low_sr[..., lo] * (1.0 - w) + low_sr[..., hi] * w


def ensure_last_axis_length(x: jax.Array, desired_size: int) -> jax.Array:
    """Right-pad the last axis with zeros up to ``desired_size``
    (reference ``upsample.py:35-48``)."""
    last = x.shape[-1]
    if last > desired_size:
        raise ValueError(
            f"Desired size provided was {desired_size}, but tensor is "
            f"already size {last} along last axis"
        )
    if last == desired_size:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, desired_size - last)])


def fft_upsample(x: jax.Array, factor: int = 2) -> jax.Array:
    """Band-limited upsampling by zero-padding the ortho rFFT spectrum
    (reference ``FFTUpsampleBlock.upsample``, ``upsample.py:118-138``)."""
    size = x.shape[-1]
    new_time = size * factor
    coeffs = _rfft(x, axis=-1, norm="ortho")
    pad = [(0, 0)] * (x.ndim - 1) + [(0, (new_time // 2 + 1) - coeffs.shape[-1])]
    new_coeffs = jnp.pad(coeffs, pad)
    return _irfft(new_coeffs, n=new_time, axis=-1, norm="ortho")
