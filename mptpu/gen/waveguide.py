"""Karplus-Strong / waveguide synthesis (reference
``modules/waveguide.py:12-211``).

The frequency-domain ``WaveguideSynth`` (comb-delay selection * damping *
filter, all as one spectral product) maps directly to XLA; the sequential
sample-loop ``waveguide_synth`` becomes a ``lax.scan``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fft import rfft, irfft
from ..ops.upsample import interpolate_last_axis


class WaveguideSynth:
    """(reference ``waveguide.py:43-103``)"""

    def __init__(
        self, max_delay: int = 512, n_samples: int = 2**15,
        filter_kernel_size: int = 512,
    ):
        self.n_delays = max_delay
        self.n_samples = n_samples
        self.filter_kernel_size = filter_kernel_size
        delays = np.zeros((max_delay, n_samples), dtype=np.float32)
        for i in range(max_delay):
            delays[i, :: (i + 1)] = 1.0
        self.delays = jnp.asarray(delays)

    def __call__(self, key, impulse, delay_selection, damping, filt):
        batch = delay_selection.shape[0]
        n_frames = filt.shape[-1]

        f = jax.nn.sigmoid(filt).reshape(-1, 1, filt.shape[-1])
        f = interpolate_last_axis(f, self.n_samples // 2)
        filt_spec = jnp.pad(f, ((0, 0), (0, 0), (0, 1)))

        impulse = impulse.reshape(batch, 1, -1) ** 2
        impulse = interpolate_last_axis(impulse, self.n_samples)
        noise = jax.random.uniform(
            key, (batch, 1, self.n_samples), minval=-1.0, maxval=1.0
        )
        impulse = impulse * noise

        damping = jax.nn.sigmoid(damping.reshape(batch, 1)) * 0.9999
        powers = jnp.linspace(1, damping.shape[-1], n_frames)
        damping = damping[:, :, None] ** powers[None, None, :]
        damping = interpolate_last_axis(damping, self.n_samples, mode="nearest")

        sel = delay_selection.reshape(batch, self.n_delays, -1)
        sel = jax.nn.softmax(sel, axis=1)
        sel = interpolate_last_axis(sel, self.n_samples, mode="nearest")

        d = jnp.sum(sel * self.delays, axis=1, keepdims=True) * damping

        delay_spec = rfft(d, axis=-1, norm="ortho")
        impulse_spec = rfft(impulse, axis=-1, norm="ortho")
        spec = delay_spec * impulse_spec * filt_spec
        return irfft(spec, n=self.n_samples, axis=-1, norm="ortho")


def waveguide_synth_scan(
    impulse: jax.Array,
    delay: jax.Array,
    damping: jax.Array,
    filter_size: jax.Array,
    max_filter: int = 32,
) -> jax.Array:
    """Sequential waveguide (reference ``waveguide.py:183-211``) as a
    lax.scan; per-sample feedback with a moving-average filter over a
    bounded ring buffer."""
    n_samples = impulse.shape[0]
    max_delay = n_samples

    def step(carry, inputs):
        output, buf, i = carry
        delay_amt, damping_amt, fsize = inputs
        idx = jnp.clip(i - delay_amt, 0, n_samples - 1)
        delay_val = jnp.where(i > delay_amt, output[idx] * damping_amt, 0.0)
        buf = buf.at[i].set(delay_val)
        # mean of the last fsize buffer entries (bounded window)
        offsets = jnp.arange(max_filter)
        window_idx = jnp.clip(i - 1 - offsets, 0, n_samples - 1)
        mask = (offsets < fsize) & (i - 1 - offsets >= 0)
        window = buf[window_idx] * mask
        count = jnp.maximum(jnp.sum(mask), 1)
        new_val = jnp.where(jnp.sum(mask) > 0, jnp.sum(window) / count, delay_val)
        output = output.at[i].add(new_val)
        return (output, buf, i + 1), None

    init = (impulse, jnp.zeros_like(impulse), 0)
    inputs = (
        delay.astype(jnp.int32),
        damping,
        jnp.clip(filter_size.astype(jnp.int32), 0, max_filter),
    )
    (output, _, _), _ = lax.scan(step, init, inputs)
    return output
