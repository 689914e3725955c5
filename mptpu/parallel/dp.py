"""Data-parallel training: batch-sharded inputs, replicated params, XLA
psum of grads over the ICI (SURVEY.md §2.6; new design — the reference is
single-GPU).

Built on ``jax.jit`` + ``NamedSharding`` (the pjit path): params replicated,
batch sharded on the 'data' axis; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, replicated


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch onto the mesh, sharded over its leading dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def make_data_parallel_step(
    loss_fn: Callable,
    opt: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
):
    """Jitted DP step: params/opt replicated, batch sharded.

    ``loss_fn(params, batch, key) -> scalar``. The mean over the global
    batch (and therefore the grad psum) falls out of jit + shardings; no
    manual collectives. Includes the reference's NaN/Inf skip guard.
    """
    rep = replicated(mesh)
    shard = batch_sharding(mesh, axis)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # a finite loss with NaN grads silently poisons params — guard both
        ok = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        params_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state
        )
        return params_out, opt_out, loss

    def run(params, opt_state, batch, key):
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        batch = jax.device_put(batch, shard)
        return step(params, opt_state, batch, key)

    return run
