"""Scattering transform (reference ``modules/scattering.py:10-181``):
first-order rectified filterbank energies plus second-order structure of
the local-average-removed fine detail.

The reference's TorchScript module becomes one jitted XLA program; the
per-band python loop of ``MoreCorrectScattering`` (each channel filtered
by all lower-frequency filters) is kept static and unrolled — band count
is small and fixed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .filterbank import (
    morlet_filter_bank,
    mel_scale_hz,
    filter_bank_convolve,
    avg_pool_1d,
)


def scattering_transform(
    signal: jax.Array,
    d: jnp.ndarray,
    window_size: int = 512,
    step_size: int = 256,
):
    """(batch, samples) x (n_filters, taps) -> (c1, c2) first/second-order
    scattering coefficients (reference ``scattering.py:97-120``)."""
    batch, samples = signal.shape
    n_filters = d.shape[0]

    s1 = jnp.abs(filter_bank_convolve(signal, d))
    s1 = s1.reshape(batch, -1, samples)
    pooled = avg_pool_1d(s1, window_size, 1, step_size)[..., :samples]
    c1 = avg_pool_1d(pooled, step_size, step_size, step_size // 2)

    s2 = s1 - pooled
    s2 = s2.reshape(-1, samples)
    s2 = jnp.abs(filter_bank_convolve(s2, d))
    s2 = s2.reshape(batch, -1, samples)
    c2 = avg_pool_1d(s2, window_size, step_size, step_size)
    return c1, c2


class MoreCorrectScattering:
    """Second-order scattering where each fine-detail channel is
    re-filtered only by filters *below* its center frequency (reference
    ``scattering.py:10-70``)."""

    def __init__(
        self,
        samplerate: int,
        center_frequencies_hz,
        kernel_size: int,
        scaling_factors=0.1,
    ):
        bank = morlet_filter_bank(
            samplerate, kernel_size, center_frequencies_hz, scaling_factors
        ).real.astype(np.float32)
        self.filter_bank = jnp.asarray(bank)
        self.window_size = kernel_size
        self.step_size = kernel_size // 2
        self.n_bands = bank.shape[0]

    def __call__(self, x: jax.Array) -> jax.Array:
        batch = x.shape[0]
        x = x.reshape(batch, -1)
        n_samples = x.shape[-1]
        n_frames = n_samples // self.step_size

        orig_spec = jnp.abs(
            filter_bank_convolve(x, self.filter_bank, padding=self.step_size)
        )
        avg = avg_pool_1d(orig_spec, self.window_size, 1, self.step_size)[
            ..., :n_samples
        ]
        first_order = avg_pool_1d(
            orig_spec, self.window_size, self.step_size, self.step_size
        )[..., :n_frames]

        fine = (orig_spec - avg).reshape(batch, self.n_bands, n_samples)

        output = []
        for i in range(2, self.n_bands):
            bank = self.filter_bank[:i]
            sig = fine[:, i, :]
            spec = jnp.abs(
                filter_bank_convolve(sig, bank, padding=self.step_size)
            )
            spec = avg_pool_1d(
                spec, self.window_size, self.step_size, self.step_size
            )[..., :n_frames]
            output.append(spec)
        second_order = jnp.concatenate(output, axis=1)
        return jnp.concatenate([first_order, second_order], axis=1)
