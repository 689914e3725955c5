"""One MLP head per entry of an event generator's ``shape_spec``
(reference ``modules/multiheadtransform.py:10-51``)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import flax.linen as nn

from .linear import LinearOutputStack

ShapeSpec = Dict[str, Tuple[int, ...]]


class MultiHeadTransform(nn.Module):
    """(batch, n_events, latent) -> {name: (batch, n_events, *shape)}."""

    latent_dim: int
    hidden_channels: int
    shapes: "ShapeSpec"
    n_layers: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        batch, n_events, _ = x.shape
        out = {}
        for name in sorted(self.shapes.keys()):
            shape = tuple(self.shapes[name])
            head = LinearOutputStack(
                channels=self.hidden_channels,
                layers=self.n_layers,
                in_channels=self.latent_dim,
                out_channels=int(np.prod(shape)),
                unit_norm_out=True,
                init_scale=self.init_scale,
                name=f"head_{name}",
            )
            out[name] = head(x).reshape(batch, n_events, *shape)
        return out
