"""Audio operator: a neural operator from symbolic event parameters
(start, duration, envelope shape, instrument latent) to rasterized
event audio, trained on an infinite synthetic gamma-envelope corpus
(reference ``audiooperator.py:31-345``).

TPU-first notes: the reference rasterizes each training example with a
per-example Python loop over dynamic slice sizes
(``audiooperator.py:82-112``); here rasterization is one fused
coordinate-mapped gather over the full (batch, resolution) grid — fully
static shapes, vmap-free broadcasting, jit/MXU friendly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.init import uniform_init
from ..nn.linear import LinearOutputStack
from ..ops.pdf import gamma_pdf


def band_pos_encode(
    x: jax.Array,
    n_bands: int,
    min_freq: float = 0.01,
    max_freq: float = 128.0,
) -> jax.Array:
    """Interleaved sin/cos position features over linearly-spaced bands
    (reference ``PosEncoder``, ``audiooperator.py:38-70``).

    x: (batch, n_events, time) -> (batch, n_events, 2 * n_bands, time),
    even channels sin, odd channels cos."""
    freqs = jnp.linspace(min_freq, max_freq, n_bands).reshape(1, 1, -1, 1)
    s = jnp.sin(x[:, :, None, :] * freqs)
    c = jnp.cos(x[:, :, None, :] * freqs)
    # interleave: (..., n_bands, 2, time) -> (..., 2 * n_bands, time)
    out = jnp.stack([s, c], axis=3)
    b, e = x.shape[0], x.shape[1]
    return out.reshape(b, e, 2 * n_bands, x.shape[-1])


def generate_training_batch(
    key: jax.Array,
    n_examples: int,
    resolution: int,
    envelope_resolution: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Random gamma envelopes rasterized at random starts/durations
    (reference ``audiooperator.py:82-112``).

    Returns (target (n, 1, resolution), start_times (n,), durations (n,),
    envelopes (n, envelope_resolution)); times/durations in [0, 1].

    The reference places ``interpolate(envelope, duration_samples)`` at
    ``start``; here each output sample gathers the envelope at its
    normalized in-event coordinate — the same linear interpolation,
    computed as one static-shape expression instead of a per-example
    loop over dynamic slices."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    start_times = jax.random.uniform(k1, (n_examples,))
    durations = jax.random.uniform(k2, (n_examples,), minval=1e-3, maxval=1.0)
    a = 1e-12 + jax.random.uniform(k3, (n_examples, 1), maxval=10.0)
    b = 1e-12 + jax.random.uniform(k4, (n_examples, 1), maxval=10.0)
    envelopes = gamma_pdf(a[:, 0], b[:, 0], envelope_resolution)

    start_samples = jnp.floor(start_times * resolution).astype(jnp.int32)
    duration_samples = jnp.floor(durations * resolution).astype(jnp.int32)

    j = jnp.arange(resolution)[None, :]  # (1, resolution)
    # in-event coordinate of output sample j, in envelope index units
    # (torch align_corners=False convention, matching interpolate_last_axis)
    rel = j - start_samples[:, None]
    scale = envelope_resolution / jnp.maximum(duration_samples[:, None], 1)
    coords = (rel + 0.5) * scale - 0.5
    inside = (rel >= 0) & (rel < duration_samples[:, None])
    cc = jnp.clip(coords, 0.0, envelope_resolution - 1)
    lo = jnp.floor(cc).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, envelope_resolution - 1)
    w = cc - lo
    gathered = (
        jnp.take_along_axis(envelopes, lo, axis=1) * (1.0 - w)
        + jnp.take_along_axis(envelopes, hi, axis=1) * w
    )
    target = jnp.where(inside, gathered, 0.0)[:, None, :]
    return target, start_times, durations, envelopes


class AudioOperator(nn.Module):
    """Embed event parameters + per-sample position, decode amplitude *
    envelope per output sample (reference ``Model``,
    ``audiooperator.py:124-213``)."""

    envelope_resolution: int
    latent_dim: int
    pos_encoding_dim: int
    model_dim: int

    @nn.compact
    def __call__(self, start, duration, envelope, event_properties, pos):
        """start/duration: (batch, n_events, pos_encoding_dim); envelope:
        (batch, n_events, envelope_resolution); event_properties:
        (batch, n_events, latent_dim); pos: (batch, n_events,
        pos_encoding_dim, resolution) -> (batch, n_events, resolution)."""
        resolution = pos.shape[-1]
        batch, n_events = start.shape[:2]
        kw = dict(kernel_init=uniform_init(0.02))

        s = nn.Dense(self.model_dim, **kw)(start)
        d = nn.Dense(self.model_dim, **kw)(duration)
        e = nn.Dense(self.model_dim, **kw)(envelope)
        p = nn.Dense(self.model_dim, **kw)(event_properties)
        # (batch, n_events, pos_dim, time) -> (batch, time, model_dim)
        pe = nn.Dense(self.model_dim, **kw)(
            jnp.transpose(pos, (0, 1, 3, 2))
        ).reshape(batch, resolution, self.model_dim)

        x = jnp.concatenate([s, d, e, p], axis=-1)
        x = nn.Dense(self.model_dim, **kw)(x)  # (batch, n_events, model_dim)

        orig = x + pe  # broadcast over the time axis (n_events == 1)
        net = LinearOutputStack(
            channels=self.model_dim, layers=2, out_channels=1,
            in_channels=self.model_dim, activation=jax.nn.selu,
            init_scale=0.02,
        )
        env_head = LinearOutputStack(
            channels=self.model_dim, layers=2, out_channels=1,
            in_channels=self.model_dim, activation=jax.nn.selu,
            init_scale=0.02,
        )
        out = net(orig) * jax.nn.relu(env_head(orig))
        return out.reshape(batch, n_events, resolution)


def envelope_loss(
    target: jax.Array,
    recon: jax.Array,
    window: int,
    step: int,
) -> jax.Array:
    """Energy-removal loss on avg-pooled rectified envelopes (reference
    ``audiooperator.py:311-335``: pooled norms of target vs residual)."""
    def pool(x):
        s = jax.lax.reduce_window(
            jnp.abs(x), 0.0, jax.lax.add,
            (1, 1, window), (1, 1, step), [(0, 0), (0, 0), (step, step)],
        )
        return s / window

    td = pool(target)
    rd = pool(recon)
    start_norm = jnp.linalg.norm(td, axis=-1)
    end_norm = jnp.linalg.norm(td - rd, axis=-1)
    return jnp.sum(-(start_norm - end_norm))
