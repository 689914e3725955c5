"""Perceptual feature distances for evaluation.

The reference's framing is a *perceptually* lossless codec: its training
losses run on auditory feature spaces (PIF ``modules/pif.py:7-37``, AIM
``modules/aim.py:28-48``), but every eval number this repo published
through round 3 was SNR/LSD. These helpers score reconstructions in the
same phase-invariant feature spaces the reference optimizes, closing the
loop (VERDICT r3 next-round item 6): waveform SNR punishes phase error
the ear cannot hear, LSD ignores time structure inside a frame — the PIF
distance is invariant to exactly the within-window phase the codec is
allowed to scramble.

It also arbitrates the round-3 refit anomaly (streaming+refit decode had
*worse* LSD than the raw walk while improving waveform SNR): the refit
re-projects per-event gains for waveform error, which can sharpen
magnitude mismatch in frames where two events overlap — whether that
matters perceptually is precisely what a phase-invariant periodicity
feature measures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pif import fft_based_pif


def pif_distance(
    target: jax.Array,
    recon: jax.Array,
    freq_window_size: int = 64,
    time_window_size: int = 32,
    eps: float = 1e-8,
) -> jax.Array:
    """Relative L1 distance between phase-invariant features.

    ``sum |PIF(t) - PIF(r)| / (sum |PIF(t)| + sum |PIF(r)| + eps)``,
    scaled so 0.0 is a perceptually perfect reconstruction under the
    feature and 1.0 the worst case (a silent recon of non-silent audio
    scores exactly 1.0; by the triangle inequality the ratio cannot
    exceed 1). The symmetric denominator keeps the metric bounded when
    the TARGET slice is silent too (a one-sided denominator measured
    ~1.8e9 on a silent holdout half). Reported as ``pif_dist`` in eval
    JSONs (lower is better).

    Inputs are ``(batch, 1, n_samples)`` audio; the feature is the
    reference's FFT-based PIF (``modules/pif.py:7-37``): spectrum
    windowed into channels, back to time, rectified + sqrt-compressed,
    then per-channel windowed rFFT magnitudes — invariant to absolute
    phase within each time window.
    """
    ft = fft_based_pif(target, freq_window_size, time_window_size)
    fr = fft_based_pif(recon, freq_window_size, time_window_size)
    return jnp.sum(jnp.abs(ft - fr)) / (
        jnp.sum(jnp.abs(ft)) + jnp.sum(jnp.abs(fr)) + eps
    )
