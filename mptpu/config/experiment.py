"""Experiment bundle: samplerate / n_samples / filterbank / perceptual
feature + loss (reference ``config/experiment.py:13-108``).

The reference wraps a zounds mel-scale morlet FilterBank; here the
filterbank is a geometric-spaced gammatone bank (same role: a
perceptually-spaced analytic front-end) applied via FFT convolution, with
the AIM periodicity feature on top.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..perceptual.gammatone import gammatone_filter_bank
from ..perceptual.aim import rectified_filter_bank, auditory_image
from ..ops.norms import unit_norm


class Experiment:
    def __init__(
        self,
        samplerate: int,
        n_samples: int,
        model_dim: int = 128,
        weight_init: float = 0.1,
        kernel_size: int = 512,
        windowed_pif: bool = False,
        norm_periodicities: bool = False,
    ):
        self.samplerate = samplerate
        self.n_samples = n_samples
        self.window_size = 512
        self.step_size = self.window_size // 2
        self.n_frames = n_samples // self.step_size
        self.n_bands = model_dim
        self.model_dim = model_dim
        self.kernel_size = kernel_size
        self.weight_init = weight_init
        self.windowed_pif = windowed_pif
        self.norm_periodicities = norm_periodicities

        self.filters = gammatone_filter_bank(
            model_dim,
            kernel_size,
            start_hz=20,
            stop_hz=samplerate // 2 - 10,
            samplerate=samplerate,
            band_spacing="geometric",
        )

    def apply_filter_bank(self, x: jax.Array) -> jax.Array:
        return rectified_filter_bank(x, self.filters)

    def pooled_filter_bank(self, x: jax.Array) -> jax.Array:
        """Filterbank + max temporal pooling to frame rate (the zounds
        ``temporal_pooling`` analog)."""
        orig = x.shape[-1]
        fb = self.apply_filter_bank(x)
        pooled = lax.reduce_window(
            fb,
            -jnp.inf,
            lax.max,
            window_dimensions=(1, 1, 512),
            window_strides=(1, 1, 256),
            padding=((0, 0), (0, 0), (256, 256)),
        )
        return pooled[..., : orig // 256]

    def perceptual_feature(self, x: jax.Array) -> jax.Array:
        fb = self.apply_filter_bank(x)
        return auditory_image(
            fb,
            512,
            self.n_samples // 256,
            do_windowing=self.windowed_pif,
            check_cola=False,
            norm_periodicities=self.norm_periodicities,
        )

    def perceptual_loss(self, a: jax.Array, b: jax.Array, norm: str = "l2"):
        fa = self.perceptual_feature(a)
        fb = self.perceptual_feature(b)
        if norm == "l2":
            return jnp.mean((fa - fb) ** 2)
        return jnp.sum(jnp.abs(fa - fb))

    def perceptual_triune(self, x: jax.Array):
        """(place, population, spike-timing) encodings (reference
        ``experiment.py:73-90``)."""
        batch = x.shape[0]
        fb = self.apply_filter_bank(x)
        pooled = self.pooled_filter_bank(x)
        place_encoding = unit_norm(pooled, axis=1)
        pe = lax.reduce_window(
            pooled[:, None],
            0.0,
            lax.add,
            window_dimensions=(1, 1, 8, 1),
            window_strides=(1, 1, 8, 1),
            padding="VALID",
        ) / 8.0
        pop_encoding = pe.reshape(batch, -1, pooled.shape[-1])
        st = auditory_image(
            fb, 512, self.n_samples // 256, do_windowing=False, check_cola=False
        )
        spike_timing = unit_norm(st, axis=-1)
        return place_encoding, pop_encoding, spike_timing
