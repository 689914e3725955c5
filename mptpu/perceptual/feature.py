"""Cochlea model + periodicity feature (reference
``perceptual/feature.py:12-74``), functional: the gammatone bank is a
static constant, the forward pass is conv + rectify + sqrt + smoothing."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..ops.fft import rfft as _rfft
from jax import lax

from .gammatone import gammatone_filter_bank
from ..ops.stft import _frame
from ..ops.windows import hamming_window
from ..ops.norms import unit_norm


def cochlea_filter_bank(
    n_filters: int,
    kernel_size: int,
    samplerate: int = 22050,
    start_hz: float = 20.0,
    stop_hz: float | None = None,
) -> jnp.ndarray:
    """Geometric (mel-like) gammatone bank for the cochlea model."""
    if stop_hz is None:
        stop_hz = samplerate / 2 - 10
    return gammatone_filter_bank(
        n_filters,
        kernel_size,
        start_hz=start_hz,
        stop_hz=stop_hz,
        samplerate=samplerate,
        band_spacing="geometric",
    )


def cochlea_model(
    x: jax.Array,
    filters: jnp.ndarray,
    samplerate: int = 22050,
    phase_locking_cutoff_hz: int = 5000,
) -> jax.Array:
    """Gammatone conv -> half-wave rectify -> sqrt compression ->
    phase-locking-loss smoothing (reference ``feature.py:41-60``)."""
    x = x.reshape(x.shape[0], 1, -1)
    n_samples = x.shape[-1]
    n_filters, kernel_size = filters.shape
    out = lax.conv_general_dilated(
        x,
        filters[:, None, :],
        window_strides=(1,),
        padding=[(kernel_size // 2, kernel_size // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[..., :n_samples]
    out = jax.nn.relu(out)
    out = jnp.sqrt(out)
    plk = int((samplerate / 2) / phase_locking_cutoff_hz)
    if plk > 1:
        smoothed = lax.reduce_window(
            out,
            0.0,
            lax.add,
            window_dimensions=(1, 1, plk),
            window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (plk // 2, plk // 2)),
        ) / plk
        out = smoothed[..., :n_samples]
    return out


def periodicity_feature(
    x: jax.Array, window_size: int, step: int
) -> jax.Array:
    """Unit-normed complex periodicity spectrum per channel frame
    (reference ``Periodicity``, ``feature.py:62-74``)."""
    x = jnp.pad(x, ((0, 0), (0, 0), (0, step)))
    framed = _frame(x, window_size, step)
    framed = framed * hamming_window(window_size, dtype=framed.dtype)
    spec = _rfft(framed, axis=-1, norm="ortho")
    norm = jnp.sqrt(jnp.sum(jnp.abs(spec) ** 2, axis=-1, keepdims=True))
    return spec / (norm + 1e-8)


class CochleaModel:
    """Object form of ``cochlea_model`` holding a precomputed filter bank
    (reference ``perceptual/feature.py:12-60``)."""

    def __init__(
        self,
        samplerate: int = 22050,
        n_filters: int = 128,
        kernel_size: int = 512,
        start_hz: float = 20.0,
        stop_hz: float | None = None,
        phase_locking_cutoff_hz: int = 5000,
    ):
        self.samplerate = samplerate
        self.phase_locking_cutoff_hz = phase_locking_cutoff_hz
        self.filters = cochlea_filter_bank(
            n_filters, kernel_size, samplerate, start_hz, stop_hz
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return cochlea_model(
            x, self.filters, self.samplerate, self.phase_locking_cutoff_hz
        )
