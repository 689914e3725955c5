"""Optimizer factory + generic train step (reference ``train/optim.py:3``:
Adam lr=1e-4, betas=(0, 0.9))."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def optimizer(lr: float = 1e-4, b1: float = 0.0, b2: float = 0.9):
    """The reference's default Adam."""
    return optax.adam(learning_rate=lr, b1=b1, b2=b2)


def trust_ratio_clip(
    ratio: float, floor: float = 1e-3
) -> optax.GradientTransformation:
    """Per-leaf trust-ratio clipping, applied AFTER the inner optimizer:
    no single step may move a parameter leaf by more than
    ``ratio * max(||p||, floor)``.

    This is the round-4 divergence-storm bound (BENCHMARKS.md
    "optimizer-knob A/B"): the storms' replay diagnostic (nan_hunt4)
    showed FINITE gradients with gnorm spiking to 3e13 at a frozen
    parameter point — an optimizer cliff on the piecewise
    greedy-selection objective, where global-norm clipping still lets
    ONE layer absorb the whole clipped budget. The reference merely
    skips non-finite steps (``iterativedecomposition.py:535-540``) and
    its long runs ride out the spikes; this bounds them per-leaf,
    LARS-style.

    LARS convention for degenerate leaves: the param norm is FLOORED so
    a zero-initialized leaf (every bias at init) may still take
    floor-scaled steps — its cap then grows with it (multiplicative
    ≤ 1 + ratio per step, ~40 steps from 1e-3 to 1). The naive
    ``||p||/||u||`` form froze all zero-init leaves forever and
    flatlined a full-config run at 0.001 dB where the control reached
    3.5 dB by step 400.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("trust_ratio_clip needs params")

        def _clip(u, p):
            un = jnp.linalg.norm(u.ravel())
            pn = jnp.maximum(jnp.linalg.norm(p.ravel()), floor)
            return u * jnp.minimum(1.0, ratio * pn / (un + 1e-12))

        return jax.tree_util.tree_map(_clip, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_train_step(loss_fn: Callable, opt: optax.GradientTransformation):
    """Returns jitted step(params, opt_state, *batch) -> (params, opt_state,
    loss). Includes the reference's NaN/Inf guard
    (``iterativedecomposition.py:535-540``): non-finite loss skips the
    update instead of poisoning the weights."""

    @jax.jit
    def step(params, opt_state, *args):
        loss, grads = jax.value_and_grad(loss_fn)(params, *args)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(loss)
        params_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        return params_out, opt_out, loss

    return step
