"""Event placement schedulers (reference
``modules/eventgenerators/schedule.py:11-105`` + ``hierarchical_dirac``
``modules/transfer.py:73-128``).

Schedulers are static-config objects with ``init_params(key)`` and a pure
``schedule(pos, events)``; positions stay differentiable through
straight-through one-hots (soft backward) and FFT phase ramps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fft import fft_convolve, rfft, irfft, cexp
from ..ops.ste import sparse_softmax
from ..ops.upsample import upsample_with_holes


def interpretable_fft_shift(a: jax.Array, shift: jax.Array) -> jax.Array:
    """Circular FFT shift where shift in [0,1] maps across half the signal
    (reference ``schedule.py:11-33``; note it does NOT pad, so it wraps)."""
    shift = 1.0 - shift
    n_samples = a.shape[-1]
    shift_samples = shift * n_samples * 0.5
    spec = rfft(a, axis=-1, norm="ortho")
    n_coeffs = spec.shape[-1]
    theta = (jnp.arange(n_coeffs) * 2.0 * jnp.pi / n_coeffs) * shift_samples
    spec = spec * cexp(theta)
    return irfft(spec, n=n_samples, axis=-1, norm="ortho")


def hierarchical_dirac(
    elements: jax.Array, soft: bool = False, return_logits: bool = False
):
    """Binary-tree dirac: (..., log2(n), 2) choices -> (..., n) one-hot
    (reference ``modules/transfer.py:73-128``)."""
    seq_shape = elements.shape[:-2]
    steps = elements.shape[-2]
    if soft:
        chosen = jax.nn.softmax(elements, axis=-1)
    else:
        chosen = sparse_softmax(elements, normalize=True, axis=-1)

    signal = chosen[..., 0, :]
    current_size = 2
    for i in range(1, steps):
        new_size = current_size * 2
        stuffed = upsample_with_holes(signal, new_size)
        current = jnp.concatenate(
            [
                chosen[..., i, :],
                jnp.zeros(seq_shape + (new_size - 2,), elements.dtype),
            ],
            axis=-1,
        )
        signal = fft_convolve(stuffed, current)
        current_size = new_size

    if return_logits:
        return signal, chosen
    return signal


class DiracScheduler:
    """Softmax positions on a coarse grid, zero-stuffed to sample rate and
    FFT-convolved with the events (reference ``schedule.py:36-62``)."""

    def __init__(
        self,
        n_events: int,
        start_size: int,
        n_samples: int,
        pre_sparse: bool = False,
    ):
        self.n_events = n_events
        self.start_size = start_size
        self.n_samples = n_samples
        self.pre_sparse = pre_sparse

    @property
    def param_shape(self):
        return (1, self.n_events, self.start_size)

    def init_params(self, key: jax.Array) -> jax.Array:
        pos = jax.random.uniform(
            key, self.param_shape, minval=-0.02, maxval=0.02
        )
        if self.pre_sparse:
            pos = sparse_softmax(pos, normalize=True, axis=-1)
        return pos

    random_params = init_params

    def schedule(self, pos: jax.Array, events: jax.Array) -> jax.Array:
        if not self.pre_sparse:
            pos = sparse_softmax(pos, normalize=True, axis=-1)
        pos = upsample_with_holes(pos, desired_size=self.n_samples)
        return fft_convolve(events, pos)


class FFTShiftScheduler:
    """Scalar positions applied as circular FFT shifts (reference
    ``schedule.py:65-80``)."""

    def __init__(self, n_events: int):
        self.n_events = n_events

    @property
    def param_shape(self):
        return (1, self.n_events, 1)

    def init_params(self, key: jax.Array) -> jax.Array:
        return jax.random.uniform(key, self.param_shape, minval=0.0, maxval=1.0)

    random_params = init_params

    def schedule(self, pos: jax.Array, events: jax.Array) -> jax.Array:
        return interpretable_fft_shift(events, pos)


class HierarchicalDiracModel:
    """Binary-tree positions (reference ``schedule.py:83-105``)."""

    def __init__(self, n_events: int, signal_size: int):
        self.n_events = n_events
        self.signal_size = signal_size
        self.n_elements = int(np.log2(signal_size))

    @property
    def param_shape(self):
        return (1, self.n_events, self.n_elements, 2)

    def init_params(self, key: jax.Array) -> jax.Array:
        return jax.random.uniform(
            key, self.param_shape, minval=-0.02, maxval=0.02
        )

    random_params = init_params

    def schedule(self, pos: jax.Array, events: jax.Array) -> jax.Array:
        x = hierarchical_dirac(pos)
        return fft_convolve(x, events)
