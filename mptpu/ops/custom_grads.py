"""Hand-written gradient ops (``jax.custom_vjp``) — the reference's custom
``torch.autograd.Function``s (``modules/transfer.py:626-719``
``ScalarPosition`` / ``FFTShifter`` / ``Position`` / ``schedule_atoms``,
``modules/diffindex.py:27`` ``DifferentiableIndex``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .fft import fft_shift


def _correlate(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross-correlation via conjugate spectrum (the ``correlation=True``
    path of reference ``transfer.py:548-569``); kept local to avoid an
    ops -> gen import cycle."""
    n = a.shape[-1]
    sa = jnp.fft.rfft(a, n=2 * n, axis=-1)
    sb = jnp.conj(jnp.fft.rfft(b, n=2 * n, axis=-1))
    return jnp.fft.irfft(sa * sb, n=2 * n, axis=-1)[..., :n]


def position_render(
    positions: jax.Array, clips: jax.Array, n_samples: int,
    sum_channels: bool = False,
) -> jax.Array:
    """Hard-place each clip at its scalar position in [0, 1) (reference
    ``transfer.py:680-719`` ``position`` — batched here, no python loops)."""
    batch, n_clips = positions.shape
    if clips.shape[0] == 1:
        clips = jnp.broadcast_to(clips, (batch,) + clips.shape[1:])
    starts = (positions * n_samples).astype(jnp.int32)

    def place(clip, start):
        padded = jnp.zeros(2 * n_samples, clip.dtype)
        padded = lax.dynamic_update_slice(padded, clip, (start,))
        return padded[:n_samples]

    out = jax.vmap(jax.vmap(place))(clips, starts)
    if sum_channels:
        out = jnp.sum(out, axis=1, keepdims=True)
    return out


# ---- ScalarPosition: one-hot forward; backward pushes the position toward
# the side of the incoming gradient with more mass (transfer.py:626-659)


@jax.custom_vjp
def scalar_position(positions: jax.Array, n_samples: int) -> jax.Array:
    indices = (positions * n_samples * 0.9999).astype(jnp.int32)
    batch, n_examples = positions.shape[:2]
    one_hot = jnp.zeros((batch, n_examples, n_samples), positions.dtype)
    return jnp.put_along_axis(
        one_hot, indices.reshape(batch, n_examples, 1),
        jnp.ones_like(positions).reshape(batch, n_examples, 1),
        axis=-1, inplace=False,
    )


def _scalar_position_fwd(positions, n_samples):
    indices = (positions * n_samples * 0.9999).astype(jnp.int32)
    return scalar_position(positions, n_samples), (indices, positions.shape)


def _scalar_position_bwd(res, g):
    indices, pos_shape = res
    # grad = sum(g[idx:]) - sum(g[:idx]) = total - 2 * exclusive_prefix(idx)
    total = jnp.sum(g, axis=-1)
    prefix = jnp.cumsum(g, axis=-1)
    idx = indices.reshape(indices.shape[0], -1, 1)
    before = jnp.take_along_axis(
        jnp.pad(prefix, ((0, 0), (0, 0), (1, 0))), idx, axis=-1
    )[..., 0]
    grads = total - 2.0 * before
    return grads.reshape(pos_shape), None


scalar_position.defvjp(_scalar_position_fwd, _scalar_position_bwd)


# ---- FFTShifter: fft_shift forward, straight-through gradient to items
# (transfer.py:664-677)


@jax.custom_vjp
def differentiable_fft_shift(items: jax.Array, positions: jax.Array):
    return fft_shift(items, positions)


def _fft_shifter_fwd(items, positions):
    return fft_shift(items, positions), jnp.zeros_like(positions)


def _fft_shifter_bwd(res, g):
    return g, res


differentiable_fft_shift.defvjp(_fft_shifter_fwd, _fft_shifter_bwd)


# ---- Position / schedule_atoms: hard render forward; backward computes
# the correlation-optimal position and per-clip render error
# (transfer.py:680-716)


@jax.custom_vjp
def schedule_atoms(items: jax.Array, positions: jax.Array, targets: jax.Array):
    return position_render(positions, items, items.shape[-1])


def _schedule_atoms_fwd(items, positions, targets):
    out = position_render(positions, items, items.shape[-1])
    return out, (positions, targets, items)


def _schedule_atoms_bwd(res, g):
    pos, targets, clips = res
    batch = g.shape[0]
    n_samples = g.shape[-1]
    targets_v = targets.reshape(batch, 1, n_samples)
    clips_v = clips.reshape(-1, pos.shape[1], n_samples)

    conv = _correlate(targets_v, clips_v)
    real_best = jnp.argmax(conv, axis=-1) / conv.shape[-1]
    pos_grad = pos - real_best

    best_render = fft_shift(clips_v, real_best[..., None])
    clip_loss = best_render - targets_v
    clip_loss = fft_shift(clip_loss, -real_best[..., None])
    return clip_loss.reshape(clips.shape), pos_grad, None


schedule_atoms.defvjp(_schedule_atoms_fwd, _schedule_atoms_bwd)


# ---- DifferentiableIndex: nearest-palette lookup forward; backward nudges
# indices toward the neighbor that better matches the error (diffindex.py)


def _to_hard_indices(soft, size):
    indices = jnp.clip(soft, -0.999, 0.999).reshape(-1)
    return jnp.round(((indices + 1) / 2) * size).astype(jnp.int32)


@jax.custom_vjp
def diff_index(palette: jax.Array, indices: jax.Array):
    p = palette.reshape(-1)
    hard = _to_hard_indices(indices, p.shape[0])
    return p[jnp.clip(hard, 0, p.shape[0] - 1)].reshape(indices.shape)


def _diff_index_fwd(palette, indices):
    p = palette.reshape(-1)
    hard = _to_hard_indices(indices, p.shape[0])
    hard = jnp.clip(hard, 0, p.shape[0] - 1)
    sampled = p[hard]
    return sampled.reshape(indices.shape), (p, indices.shape, hard, sampled)


def _diff_index_bwd(res, g):
    p, idx_shape, hard, sampled = res
    left = jnp.clip(hard - 1, 0, p.shape[0] - 1)
    right = jnp.clip(hard + 1, 0, p.shape[0] - 1)
    error = g.reshape(-1)
    left_grad = jnp.abs(error - (sampled - p[left]) - error)
    right_grad = jnp.abs(error - (sampled - p[right]))
    step = 2.0 / p.shape[0]
    grad = jnp.sign(right_grad - left_grad) * step
    return None, grad.reshape(idx_shape)


diff_index.defvjp(_diff_index_fwd, _diff_index_bwd)
