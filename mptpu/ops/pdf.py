"""Gaussian / Gamma probability envelopes used by the splatting event
generators (reference ``modules/normal_pdf.py:6-46``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as _norm
from jax.scipy.special import gammaln


def pdf(x: jax.Array, mean: jax.Array, sd: jax.Array, epsilon: float = 1e-8):
    """Plain normal pdf (reference ``normal_pdf.py:6-10``)."""
    var = sd**2 + epsilon
    denom = jnp.sqrt(2 * jnp.pi * var)
    num = jnp.exp(-((x - mean) ** 2) / (2 * var))
    return num / denom


def pdf2(
    means: jax.Array, stds: jax.Array, n_elements: int, normalize: bool = True
) -> jax.Array:
    """Normal pdf sampled on a [0, 1] grid, broadcast over leading dims,
    optionally peak-normalized (reference ``normal_pdf.py:13-24``)."""
    grid = jnp.linspace(0.0, 1.0, n_elements)
    log_prob = _norm.logpdf(grid, loc=means[..., None], scale=stds[..., None])
    prob = jnp.exp(log_prob)
    if normalize:
        prob = prob / (jnp.max(prob, axis=-1, keepdims=True) + 1e-8)
    return prob


def gamma_pdf(
    shape: jax.Array, rate: jax.Array, n_elements: int, normalize: bool = True
) -> jax.Array:
    """Gamma pdf sampled on a [1e-12, 20] grid (the reference's arbitrary
    support, ``normal_pdf.py:27-46``), peak-normalized."""
    grid = jnp.linspace(1e-12, 20.0, n_elements)
    a = shape[..., None]
    b = rate[..., None]
    log_prob = a * jnp.log(b) + (a - 1.0) * jnp.log(grid) - b * grid - gammaln(a)
    prob = jnp.exp(log_prob)
    if normalize:
        prob = prob / (jnp.max(prob, axis=-1, keepdims=True) + 1e-8)
    return prob
