"""Extended resonance lookup zoo (reference
``modules/eventgenerators/overfitresonance.py``: ``SampleResonanceLookup``
``:172``, ``MultibandResonanceLookup`` ``:189``, ``FFTResonanceLookup``
``:394``, ``WavetableLookup`` ``:439``, ``MultiSSM`` ``:117``)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.decompose import fft_frequency_recompose
from ..ops.norms import unit_norm
from ..ops.upsample import ensure_last_axis_length
from ..sparse.topk import sparsify
from .generator import EventGenerator, ShapeSpec
from .overfitresonance import Lookup
from .schedule import DiracScheduler
from .ssm import SSM
from .transfer import (
    freq_domain_transfer_function_to_resonance,
    make_waves_vectorized,
)


class SampleResonanceLookup(Lookup):
    """Noise-times-power-law-decay sample table (reference ``:172-186``)."""

    selection_type: str = "relu"

    def _items(self):
        def init(key, shape):
            n_items, n_samples = shape
            noise = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
            ramp = jnp.linspace(1, 0, n_samples)[None, :]
            decays = jnp.linspace(2, 80, n_items)[:, None]
            return (ramp**decays) * noise

        return self.param("items", init, (self.n_items, self.n_samples))

    def postprocess_results(self, items, key=None):
        return unit_norm(items)


class FFTResonanceLookup(Lookup):
    """Per-bin (magnitude decay, start phase, start magnitude) transfer
    functions -> time-domain resonances (reference ``:394-436``).

    ``n_samples`` here is the *output* sample count; the item table holds
    3 * (window//2+1) parameters per item.
    """

    window_size: int = 2048
    base_resonance: float = 0.5
    selection_type: str = "relu"

    def _items(self):
        chunk = self.window_size // 2 + 1

        def init(key, shape):
            k1, k2 = jax.random.split(key)
            vals = jax.random.uniform(k1, shape, minval=-6.0, maxval=6.0)
            mask = jax.random.bernoulli(k2, 0.01, shape)
            return vals * mask

        return self.param("items", init, (self.n_items, chunk * 3))

    def postprocess_results(self, items, key=None):
        chunk = self.window_size // 2 + 1
        step = self.window_size // 2
        n_frames = self.n_samples // step
        span = 1 - self.base_resonance
        lead_shape = items.shape[:-1]

        mags = self.base_resonance + (
            jax.nn.sigmoid(items[..., :chunk]) * 0.9999
        ) * span
        phases = jnp.tanh(items[..., chunk : chunk * 2]) * jnp.pi
        starts = jax.nn.sigmoid(items[..., -chunk:])

        out = freq_domain_transfer_function_to_resonance(
            self.window_size,
            mags,
            n_frames,
            apply_decay=True,
            start_phase=phases,
            start_mags=starts,
            log_space_scan=True,
        )
        out = out.reshape(lead_shape + (-1,))
        return unit_norm(out, axis=-1)


class WavetableLookup(Lookup):
    """Selection over a saw/square/tri/sine wavetable (reference
    ``:439-470``). ``n_samples`` is the number of resonances; the waves
    are (n_resonances, wave_samples)."""

    wave_samples: int = 16384
    samplerate: int = 22050
    learnable: bool = False

    def _waves(self):
        w = make_waves_vectorized(
            self.wave_samples,
            np.linspace(20, 4000, num=self.n_samples // 4),
            self.samplerate,
        )
        if self.learnable:
            return self.param("waves", lambda k, s: w, w.shape)
        return w

    @nn.compact
    def __call__(self, selections, key=None):
        items = self._items()
        from ..sparse.quantize import select_items

        sel = select_items(selections, items, self.selection_type)
        return sel @ self._waves()


class MultibandResonanceLookup(Lookup):
    """Per-octave-band transfer-function resonances recomposed to full
    rate (reference ``:189-257``)."""

    smallest_band_size: int = 512
    base_resonance: float = 0.2
    window_size: int = 64
    out_samples: int = 16384
    selection_type: str = "relu"

    def _band_sizes(self):
        lo = int(np.log2(self.smallest_band_size))
        hi = int(np.log2(self.out_samples))
        return [2**x for x in range(lo, hi)]

    def _items(self):
        n_coeffs = self.window_size // 2 + 1
        params_per_band = n_coeffs * 3
        total = params_per_band * len(self._band_sizes())

        def init(key, shape):
            k1, k2 = jax.random.split(key)
            vals = jax.random.uniform(k1, shape, minval=-6.0, maxval=6.0)
            mask = jax.random.bernoulli(k2, 0.01, shape)
            return vals * mask

        return self.param("items", init, (self.n_items, total))

    def postprocess_results(self, items, key=None):
        band_sizes = self._band_sizes()
        n_coeffs = self.window_size // 2 + 1
        params_per_band = n_coeffs * 3
        step = self.window_size // 2
        span = 1 - self.base_resonance
        lead_shape = items.shape[:-1]
        padded = self.out_samples * 2

        bands = {}
        for i, size in enumerate(band_sizes):
            start = i * params_per_band
            bp = items[..., start : start + params_per_band]
            mag = bp[..., :n_coeffs]
            phase = bp[..., n_coeffs : n_coeffs * 2]
            start_m = bp[..., -n_coeffs:]
            mag = self.base_resonance + (jax.nn.sigmoid(mag) * span) * 0.9999
            phase = jnp.tanh(phase) * jnp.pi
            start_m = jax.nn.sigmoid(start_m)
            band = freq_domain_transfer_function_to_resonance(
                window_size=self.window_size,
                coeffs=mag,
                n_frames=size // step,
                apply_decay=True,
                start_phase=phase,
                start_mags=start_m,
            )
            bands[size] = ensure_last_axis_length(band, size * 2)

        full = fft_frequency_recompose(bands, padded)
        full = full[..., : self.out_samples]
        full = full.reshape(lead_shape + (-1,))
        return unit_norm(full)


class MultiSSM(nn.Module, EventGenerator):
    """Event generator selecting a learned control plane for a shared SSM
    (reference ``:84-170``)."""

    context_dim: int
    control_plane_dim: int
    n_frames: int
    state_dim: int
    window_size: int
    n_models: int
    n_control_planes: int
    n_samples: int

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(control_plane_choice=(1, self.n_control_planes))

    @nn.compact
    def __call__(self, control_plane_choice, times):
        batch = control_plane_choice.shape[0]
        cp = Lookup(
            self.n_control_planes,
            self.control_plane_dim * self.n_frames,
            selection_type="sparse_softmax",
            init_scale=1.0,
            name="control_plane_selection",
        )(control_plane_choice)
        cp = cp.reshape(batch, self.control_plane_dim, self.n_frames)
        cp = jax.nn.softmax(cp.reshape(batch, -1), axis=-1).reshape(
            batch, self.control_plane_dim, self.n_frames
        )
        cp = sparsify(cp, n_to_keep=8)
        samples = SSM(
            self.control_plane_dim,
            self.window_size,
            self.state_dim,
            windowed=True,
            name="ssm",
        )(cp)
        scheduler = DiracScheduler(1, self.n_frames, self.n_samples)
        samples = ensure_last_axis_length(samples, self.n_samples)
        return scheduler.schedule(times, samples)
