"""FFT convolution / shift primitives.

Capability parity with the reference's ``modules/fft.py`` (fft_convolve
``modules/fft.py:23``, fft_shift ``:53``, randomize_phase ``:10``), designed
TPU-first: real FFTs over the last axis, power-of-two padding so XLA picks
fast radix plans, and everything shape-static so it fuses under ``jit``.
"""

from __future__ import annotations

import math
from functools import reduce

import jax
import jax.numpy as jnp


def n_fft_coeffs(size: int) -> int:
    """Number of rFFT coefficients for a real signal of ``size`` samples."""
    return size // 2 + 1


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (static python int)."""
    return 1 << max(0, (int(n) - 1)).bit_length()


# Eagerly converting a real array/scalar to complex (convert_element_type
# -> c64, e.g. ``1j * x`` or ``x + 0j``) is UNIMPLEMENTED on the axon TPU
# backend, and flax's ``init`` runs modules eagerly — so complex
# construction goes through these tiny jitted helpers (compiled complex
# ops are fine; only the eager dispatch path is broken).


@jax.jit
def to_complex(real: jax.Array, imag: jax.Array) -> jax.Array:
    """real + 1j * imag, safe under eager execution on all backends."""
    return jax.lax.complex(
        jnp.asarray(real, jnp.float32), jnp.asarray(imag, jnp.float32)
    )


@jax.jit
def cexp(phase: jax.Array) -> jax.Array:
    """exp(1j * phase), safe under eager execution on all backends."""
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


# jnp.fft's norm="ortho" computes its scale with a traced reduce_prod,
# which this TPU backend does not implement — so ortho scaling is applied
# here as a *static* python float instead.


def rfft(x: jax.Array, n: int | None = None, axis: int = -1, norm: str | None = None):
    out = jnp.fft.rfft(x, n=n, axis=axis)
    if norm == "ortho":
        out = out * (1.0 / math.sqrt(n if n is not None else x.shape[axis]))
    return out


def irfft(x: jax.Array, n: int | None = None, axis: int = -1, norm: str | None = None):
    length = n if n is not None else 2 * (x.shape[axis] - 1)
    out = jnp.fft.irfft(x, n=length, axis=axis)
    if norm == "ortho":
        out = out * math.sqrt(length)
    return out


def fft_convolve(*args: jax.Array, norm: str | None = None) -> jax.Array:
    """Multi-arg circular-safe FFT convolution.

    Each input is zero-padded to double its length (avoiding wraparound),
    transformed, multiplied together in the frequency domain, inverse
    transformed, and trimmed back to the original length. All inputs must
    share the trailing-axis length; leading axes broadcast.

    Mirrors reference ``modules/fft.py:23-35``.
    """
    n_samples = args[0].shape[-1]
    specs = [rfft(x, n=2 * x.shape[-1], axis=-1, norm=norm) for x in args]
    spec = reduce(lambda a, c: a * c, specs[1:], specs[0])
    final = irfft(spec, n=2 * n_samples, axis=-1, norm=norm)
    return final[..., :n_samples]


def simple_fft_convolve(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two-arg ortho-normalized FFT convolution (reference ``fft.py:38-50``)."""
    n = a.shape[-1]
    sa = rfft(a, n=2 * n, axis=-1, norm="ortho")
    sb = rfft(b, n=2 * n, axis=-1, norm="ortho")
    out = irfft(sa * sb, n=2 * n, axis=-1, norm="ortho")
    return out[..., :n]


def fft_shift(a: jax.Array, shift: jax.Array) -> jax.Array:
    """Differentiable fractional time shift via frequency-domain phase ramp.

    ``shift`` is in [0, 1]; a shift of 1.0 moves the signal by
    ``n_samples / 3`` samples (the reference's convention, which pads the
    signal to 3x length so shifted content never wraps around:
    ``modules/fft.py:53-69``).
    """
    n_samples = a.shape[-1]
    shift_samples = shift * n_samples * (1.0 / 3.0)
    padded_len = n_samples * 3
    spec = jnp.fft.rfft(a, n=padded_len, axis=-1)
    n_coeffs = spec.shape[-1]
    # phase = -2*pi*k/n_coeffs * shift_samples; complex exp via cexp
    # (eager complex-scalar construction is unimplemented on axon)
    theta = -(jnp.arange(n_coeffs) * 2.0 * jnp.pi / n_coeffs) * shift_samples
    ramp = cexp(theta)
    samples = jnp.fft.irfft(spec * ramp, n=padded_len, axis=-1)
    return samples[..., :n_samples]


def randomize_phase(key: jax.Array, x: jax.Array) -> jax.Array:
    """Replace a signal's phase spectrum with cumulative random phase while
    keeping magnitudes (reference ``modules/fft.py:10-20``).

    Unlike the reference (which mutates a global torch RNG), randomness is
    explicit via ``key``.
    """
    spec = jnp.fft.rfft(x, axis=-1)
    mags = jnp.abs(spec)
    phases = jax.random.uniform(
        key, spec.shape, minval=-jnp.pi, maxval=jnp.pi, dtype=x.dtype
    )
    imag = jnp.cumsum(phases, axis=1)
    imag = (imag + jnp.pi) % (2 * jnp.pi) - jnp.pi
    new_spec = mags * cexp(imag)
    return jnp.fft.irfft(new_spec, n=x.shape[-1], axis=-1)
