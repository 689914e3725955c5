"""Matching-pursuit correlation kernel.

The hot op of greedy MP: correlate a batch of residuals against every
dictionary atom at every time lag. Capability parity with the reference's
``modules/conv.py:4-53`` (dense path + sparse-frequency approximations),
re-designed for the TPU:

- The dense path is a 1-D convolution expressed with
  ``lax.conv_general_dilated`` so XLA tiles it onto the MXU (a
  [positions x atom_size] @ [atom_size x n_atoms] systolic matmul) instead
  of the reference's rFFT product + roll.
- The FFT path (useful for very long atoms) pads to a power of two so XLA
  picks fast radix plans and computes cross-correlation directly via the
  conjugate spectrum rather than flip + roll.

Semantics (both paths): ``out[b, a, t] = sum_k residual[b, c, t + k] *
atoms[a, c, k]`` for ``t`` in ``[0, n_samples)``, with the residual treated
as zero beyond its end — identical to ``F.conv1d(F.pad(residual, (0,
atom_size)), d)[..., :n_samples]`` (reference ``modules/conv.py:4-9``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .fft import next_pow2


def torch_style_conv(signal: jax.Array, atoms: jax.Array) -> jax.Array:
    """Dense MP correlation on the MXU.

    signal: (batch, channels, n_samples)
    atoms:  (n_atoms, channels, atom_size) or (n_atoms, atom_size)
    returns (batch, n_atoms, n_samples)
    """
    if atoms.ndim == 2:
        atoms = atoms[:, None, :]
    n_samples = signal.shape[-1]
    atom_size = atoms.shape[-1]
    padded = jnp.pad(signal, ((0, 0), (0, 0), (0, atom_size)))
    # lax.conv computes cross-correlation (no kernel flip) — exactly MP's
    # residual-dot-atom-at-every-lag.
    out = lax.conv_general_dilated(
        padded,
        atoms,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[..., :n_samples]


def _fft_correlate(signal: jax.Array, atoms: jax.Array) -> jax.Array:
    """Cross-correlation via conjugate rFFT product, power-of-two padded."""
    if atoms.ndim == 2:
        atoms = atoms[:, None, :]
    batch, channels, n_samples = signal.shape
    n_atoms, _, atom_size = atoms.shape
    fft_len = next_pow2(n_samples + atom_size)
    sig = jnp.fft.rfft(signal, n=fft_len, axis=-1)          # (B, C, F)
    atom = jnp.conj(jnp.fft.rfft(atoms, n=fft_len, axis=-1))  # (A, C, F)
    spec = jnp.einsum("bcf,acf->baf", sig, atom)
    fm = jnp.fft.irfft(spec, n=fft_len, axis=-1)
    return fm[..., :n_samples]


def mp_correlate(
    signal: jax.Array,
    atoms: jax.Array,
    approx: int | slice | None = None,
    use_fft: bool = False,
) -> jax.Array:
    """Batched residual-vs-dictionary correlation.

    ``approx`` mirrors reference ``modules/conv.py:24-47``:
      - ``slice``: keep only that slice of rFFT coefficients (truncated
        spectrum, the ``ApproximateConvolution`` idea of
        ``modules/approxconv.py:10-34``).
      - ``int k``: keep the top-k magnitude coefficients of the signal
        spectrum (per batch/channel) and correlate only those.
      - ``None``: exact correlation (MXU conv path unless ``use_fft``).
    """
    if signal.ndim == 2:
        signal = signal[:, None, :]
    if approx is None:
        if use_fft:
            return _fft_correlate(signal, atoms)
        return torch_style_conv(signal, atoms)

    if atoms.ndim == 2:
        atoms = atoms[:, None, :]
    batch, channels, n_samples = signal.shape
    n_atoms, _, atom_size = atoms.shape
    fft_len = next_pow2(n_samples + atom_size)
    sig = jnp.fft.rfft(signal, n=fft_len, axis=-1)
    atom = jnp.conj(jnp.fft.rfft(atoms, n=fft_len, axis=-1))

    if isinstance(approx, slice):
        n_coeffs = sig.shape[-1]
        mask = jnp.zeros((n_coeffs,), dtype=jnp.float32)
        idx = jnp.arange(n_coeffs)[approx]
        mask = mask.at[idx].set(1.0)
    else:
        # Zeroing all but the top-k magnitude coefficients of the signal
        # spectrum and then taking the full product is identical to the
        # reference's gather/product/scatter (``modules/conv.py:41-47``).
        k = int(approx)
        mags = jnp.abs(sig)                                   # (B, C, F)
        _, indices = lax.top_k(mags, k)                       # (B, C, k)
        mask = jax.vmap(jax.vmap(
            lambda m, i: jnp.zeros_like(m).at[i].set(1.0)
        ))(mags, indices)
    spec = jnp.einsum("bcf,acf->baf", sig * mask, atom)

    fm = jnp.fft.irfft(spec, n=fft_len, axis=-1)
    return fm[..., :n_samples]
