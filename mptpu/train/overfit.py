"""Generic single-segment overfit loop (reference ``util/overfit.py:42-89``)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from .optim import optimizer, make_train_step


def overfit_model(
    init_params,
    loss_fn: Callable,
    target,
    n_iterations: int = 1000,
    lr: float = 1e-3,
    key: Optional[jax.Array] = None,
    after_iteration: Optional[Callable] = None,
    log_every: int = 50,
):
    """Fit ``init_params`` to one target with Adam.

    ``loss_fn(params, target, key)`` must return a scalar. Returns
    (params, losses). The conjure-style hooks of the reference become the
    ``after_iteration(i, params, loss)`` callback.
    """
    opt = optimizer(lr=lr, b1=0.9, b2=0.999)
    opt_state = opt.init(init_params)
    key = key if key is not None else jax.random.PRNGKey(0)

    step = make_train_step(loss_fn, opt)

    params = init_params
    losses = []
    for i in range(n_iterations):
        k = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, target, k)
        if i % log_every == 0:
            losses.append(float(loss))
        if after_iteration is not None:
            after_iteration(i, params, loss)
    return params, losses
