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

import flax.linen as _nn

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
        # literal reference idiom (sparse.py:172): mathematically 1 with
        # zero gradient, and KEPT literal deliberately — in f32 at
        # values ~1e9+ the cancellation yields exactly 0, which is what
        # the torch reference computes too (the round-3 NaN post-mortem
        # relies on this: a blown-up switch zeroes its own event vector)
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


def to_key_points(x: jax.Array, n_to_keep: int = 64) -> jax.Array:
    """(batch, width, height) -> (batch, n_to_keep, 3) key points of
    (value, width-location, height-location) with soft-dirac locations
    (reference ``modules/sparse.py:230-271``) — fully batched."""
    from ..ops.ste import soft_dirac

    batch, width, height = x.shape
    flat = x.reshape(batch, -1)
    values, indices = lax.top_k(flat, n_to_keep)
    row_index = indices % width
    col_index = indices // height

    w_range = jnp.linspace(0, 1, width)
    h_range = jnp.linspace(0, 1, height)

    # column/row spans read from the original map, softened to one-hots
    col_idx = jnp.clip(col_index, 0, height - 1)
    width_span = jnp.take_along_axis(
        x, col_idx[:, None, :], axis=2
    )  # (batch, width, k)
    width_span = soft_dirac(jnp.swapaxes(width_span, 1, 2), axis=-1)
    row_idx = jnp.clip(row_index, 0, width - 1)
    height_span = jnp.take_along_axis(
        x, row_idx[:, :, None], axis=1
    )  # (batch, k, height)
    height_span = soft_dirac(height_span, axis=-1)

    w_loc = width_span @ w_range
    h_loc = height_span @ h_range
    return jnp.stack([values, w_loc, h_loc], axis=-1)


class ElementwiseSparsity(_nn.Module):
    """Expand -> top-k -> contract (reference ``modules/sparse.py:318-338``)."""

    model_dim: int
    high_dim: int = 2048
    keep: int = 64
    use_softmax: bool = False

    @_nn.compact
    def __call__(self, x):  # (batch, model_dim, time)
        xt = jnp.swapaxes(x, 1, 2)
        h = _nn.Dense(self.high_dim)(xt)
        h = jnp.swapaxes(h, 1, 2)
        if self.use_softmax:
            h = jax.nn.softmax(h, axis=1)
        sparse = sparsify(h, self.keep)
        out = _nn.Dense(self.model_dim)(jnp.swapaxes(sparse, 1, 2))
        return jnp.swapaxes(out, 1, 2), sparse


class VectorwiseSparsity(_nn.Module):
    """Learned attention -> top-k time-step vectors (reference
    ``modules/sparse.py:341-371``)."""

    model_dim: int
    keep: int = 16
    channels_last: bool = True
    normalize: bool = False

    @_nn.compact
    def __call__(self, x):
        if self.channels_last:
            x = jnp.swapaxes(x, 1, 2)  # -> (batch, channels, time)
        batch, channels, time = x.shape
        attn = _nn.Dense(1)(jnp.swapaxes(x, 1, 2)).reshape(batch, time)
        latents, indices = sparsify_vectors(
            x, attn, n_to_keep=self.keep, normalize=self.normalize
        )
        return latents, indices
