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
