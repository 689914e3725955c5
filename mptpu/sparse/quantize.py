"""Selection-type dispatch + item lookup (reference
``modules/quantize.py:13-39``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ste import sparse_softmax, hard_softmax


def hard_choice(
    selections: jax.Array,
    selection_type: str = "sparse_softmax",
    key: jax.Array | None = None,
) -> jax.Array:
    if selection_type == "sparse_softmax":
        return sparse_softmax(selections, normalize=True, axis=-1)
    if selection_type == "identity":
        return selections
    if selection_type == "gumbel_softmax":
        if key is None:
            raise ValueError("gumbel_softmax selection requires a PRNG key")
        return hard_softmax(key, selections, axis=-1, tau=0.1)
    if selection_type == "softmax":
        return jax.nn.softmax(selections, axis=-1)
    if selection_type == "relu":
        return jax.nn.relu(selections)
    raise ValueError(f"{selection_type} is an unknown selection type")


def select_items(
    selections: jax.Array,
    items: jax.Array,
    selection_type: str = "sparse_softmax",
    key: jax.Array | None = None,
) -> jax.Array:
    """``hard_choice(selections) @ items``."""
    sel = hard_choice(selections, selection_type, key=key)
    return sel @ items
