"""Top-k sparsification family.

Parity with reference ``modules/sparse.py`` (``sparsify`` ``:93``,
``sparsify2`` ``:46``, ``sparsify_vectors`` ``:165``,
``encourage_sparsity_loss`` ``:6``), fully batched: the reference's
per-batch-item python loops become gathers/scatters under ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.ste import straight_through


class SparsifyResult(NamedTuple):
    sparse: jax.Array
    indices: jax.Array
    values: jax.Array


def _scatter_flat(flat_shape, indices, values, dtype):
    out = jnp.zeros(flat_shape, dtype=dtype)
    return out.at[indices].set(values)


def sparsify(
    x: jax.Array,
    n_to_keep: int,
    return_indices: bool = False,
    soft: bool = False,
    sharpen: bool = False,
    salience: jax.Array | None = None,
):
    """Keep the top-k entries across all non-batch dims, zero the rest.

    Reference ``modules/sparse.py:93-141``. ``sharpen`` subtracts a local
    average pool before peak-picking (values still come from the original);
    ``soft`` applies the straight-through trick so the backward pass sees
    the dense input rescaled to the sparse output's norm.
    """
    orig = x
    batch = x.shape[0]
    orig_shape = x.shape

    if sharpen:
        # 2d average pool (9, 27) stride 1 with same padding over
        # (channel, time), matching F.avg_pool2d(x, (9,27), 1, (4,13))
        xs = x.reshape(-1, 1, x.shape[1], x.shape[-1])
        pooled = lax.reduce_window(
            xs,
            0.0,
            lax.add,
            window_dimensions=(1, 1, 9, 27),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (0, 0), (4, 4), (13, 13)),
        ) / (9.0 * 27.0)
        sharpened = (xs - pooled).reshape(batch, -1)
        flat = x.reshape(batch, -1)
    elif salience is not None:
        sharpened = salience.reshape(batch, -1)
        flat = x.reshape(batch, -1)
    else:
        flat = x.reshape(batch, -1)
        sharpened = flat

    _, indices = lax.top_k(sharpened, n_to_keep)
    values = jnp.take_along_axis(flat, indices, axis=-1)

    out = jax.vmap(
        lambda idx, val: _scatter_flat(flat.shape[-1], idx, val, x.dtype)
    )(indices, values)
    out = out.reshape(orig_shape)

    if salience is not None:
        out = out * salience.reshape(orig_shape)

    if soft:
        backward = orig
        b_norm = jnp.linalg.norm(
            backward.reshape(batch, -1), axis=-1
        ).reshape((batch,) + (1,) * (x.ndim - 1))
        backward = backward / (b_norm + 1e-12)
        f_norm = jnp.linalg.norm(
            out.reshape(batch, -1), axis=-1
        ).reshape((batch,) + (1,) * (x.ndim - 1))
        backward = backward * f_norm
        out = straight_through(out, backward)

    if return_indices:
        return out, indices, values
    return out


def sparsify2(x: jax.Array, n_to_keep: int = 8):
    """Top-k over (channels x time) returning (sparse, packed, one_hot)
    exactly as reference ``modules/sparse.py:46-89``:

      sparse:  (batch, channels, time) — input with all but k zeroed
      packed:  (batch, n_to_keep, time) — event k's activation at its time
      one_hot: (batch, n_to_keep, channels) — event k's channel, scaled
    """
    batch, channels, time = x.shape
    flat = x.reshape(batch, -1)
    values, indices = lax.top_k(flat, n_to_keep)
    ch = indices // time
    t = indices % time

    sparse = jax.vmap(
        lambda idx, val: _scatter_flat(channels * time, idx, val, x.dtype)
    )(indices, values).reshape(batch, channels, time)

    k_range = jnp.arange(n_to_keep)
    context_idx = k_range * channels + ch
    context = jax.vmap(
        lambda idx, val: _scatter_flat(n_to_keep * channels, idx, val, x.dtype)
    )(context_idx, values).reshape(batch, n_to_keep, channels)

    packed_idx = k_range * time + t
    packed = jax.vmap(
        lambda idx, val: _scatter_flat(n_to_keep * time, idx, val, x.dtype)
    )(packed_idx, values).reshape(batch, n_to_keep, time)

    return sparse, packed, context


def sparsify_vectors(
    x: jax.Array,
    attn: jax.Array,
    n_to_keep: int,
    normalize: bool = True,
    dense: bool = False,
):
    """Pick the k highest-attention time steps' channel vectors.

    x: (batch, channels, time), attn: (batch, time) (or broadcastable)
    returns (latents (batch, k, channels), indices (batch, k)) —
    reference ``modules/sparse.py:165-191`` without the python loops.
    """
    batch, channels, time = x.shape
    attn = attn.reshape(batch, time)
    values, indices = lax.top_k(attn, n_to_keep)
    if normalize:
        values = values + (1 - values)

    latents = jnp.take_along_axis(
        x, indices[:, None, :], axis=-1
    )  # (batch, channels, k)
    latents = jnp.transpose(latents, (0, 2, 1)) * values[..., None]

    if dense:
        out = jnp.zeros_like(x)
        out = jax.vmap(
            lambda o, idx, lat: o.at[:, idx].set(lat.T)
        )(out, indices, latents)
        return out
    return latents, indices


def encourage_sparsity_loss(
    encoding: jax.Array,
    n_unpenalized: int = 128,
    sparsity_loss_weight: float = 0.00001,
) -> jax.Array:
    """L1 penalty on everything past the top ``n_unpenalized`` activations
    (reference ``modules/sparse.py:6-26``, minus the prints)."""
    batch_size = encoding.shape[0]
    flat = encoding.reshape(batch_size, -1)
    srt = jnp.sort(flat, axis=-1)[:, ::-1]
    penalized = srt[:, n_unpenalized:]
    return jnp.abs(penalized).sum() * sparsity_loss_weight
