"""Residual-should-look-like-noise losses (reference
``modules/infoloss.py:27-105`` CorrelationLoss + ``modules/latent_loss.py:3``
covariance)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.decompose import fft_frequency_decompose
from .multiband_spec import stft_transform


def covariance(x: jax.Array) -> jax.Array:
    """Feature covariance (reference ``modules/latent_loss.py:3-8``)."""
    m = x - jnp.mean(x, axis=0, keepdims=True)
    return (m.T @ m) / x.shape[0]


def noise_loss(
    key: jax.Array,
    target: jax.Array,
    recon: jax.Array,
    window_size: int = 2048,
    step_size: int = 256,
) -> jax.Array:
    """Norm-growth hinge + |residual - noise| (reference
    ``infoloss.py:48-72``). Randomness is explicit via ``key``."""
    batch = target.shape[0]
    t_spec = stft_transform(target, window_size, step_size).reshape(batch, -1)
    r_spec = stft_transform(recon, window_size, step_size).reshape(batch, -1)
    residual = t_spec - r_spec
    mean = jnp.mean(residual)
    std = jnp.std(residual) + 1e-6
    noise_spec = mean + std * jax.random.normal(key, residual.shape, residual.dtype)

    target_norm = jnp.linalg.norm(t_spec, axis=-1, keepdims=True)
    recon_norm = jnp.linalg.norm(r_spec, axis=-1, keepdims=True)
    norm_loss = jnp.sum(jnp.clip(recon_norm - target_norm, 0.0, jnp.inf))
    return norm_loss + jnp.sum(jnp.abs(residual - noise_spec))


def multiband_noise_loss(
    key: jax.Array,
    target: jax.Array,
    recon: jax.Array,
    window_size: int,
    step: int,
    min_band_size: int = 512,
) -> jax.Array:
    """Per-octave-band noise loss (reference ``infoloss.py:33-46``)."""
    t = fft_frequency_decompose(target, min_band_size)
    r = fft_frequency_decompose(recon, min_band_size)
    loss = 0.0
    for i, (k, v) in enumerate(t.items()):
        loss = loss + noise_loss(
            jax.random.fold_in(key, i), v, r[k], window_size, step
        )
    return loss


def correlation_loss(
    key: jax.Array,
    target: jax.Array,
    recon: jax.Array,
    n_elements: int = 256,
) -> jax.Array:
    """Norm hinge + |cov(residual subset) - cov(noise subset)| (reference
    ``infoloss.py:75-105``)."""
    batch = target.shape[0]
    k_noise, k_perm = jax.random.split(key)
    t_spec = stft_transform(target).reshape(batch, -1)
    r_spec = stft_transform(recon).reshape(batch, -1)
    residual = t_spec - r_spec
    mean = jnp.mean(residual)
    std = jnp.std(residual) + 1e-8
    noise_spec = mean + std * jax.random.normal(k_noise, residual.shape, residual.dtype)

    target_norm = jnp.linalg.norm(t_spec, axis=-1, keepdims=True)
    recon_norm = jnp.linalg.norm(r_spec, axis=-1, keepdims=True)
    norm_loss = jnp.sum(jnp.clip(recon_norm - target_norm, 0.0, jnp.inf))

    indices = jax.random.permutation(k_perm, t_spec.shape[-1])[:n_elements]
    res_sub = (t_spec - r_spec)[:, indices]
    n_sub = noise_spec[:, indices]
    cov_loss = jnp.sum(jnp.abs(covariance(n_sub) - covariance(res_sub)))
    return norm_loss + cov_loss


class CorrelationLoss:
    """Object form bundling the three losses (reference
    ``infoloss.py:27-105``). Randomness is explicit: every method takes a
    PRNG key first."""

    def __init__(self, n_elements: int = 256):
        self.n_elements = n_elements

    def noise_loss(self, key, target, recon, window_size=2048, step_size=256):
        return noise_loss(key, target, recon, window_size, step_size)

    def multiband_noise_loss(self, key, target, recon, window_size, step):
        return multiband_noise_loss(key, target, recon, window_size, step)

    def forward(self, key, target, recon):
        return correlation_loss(key, target, recon, self.n_elements)

    __call__ = forward
