"""Event-set embeddings: canonical ordering + graph-edge embeddings
(reference ``modules/pointcloud.py:25-101``, ``modules/random.py``
RandomProjection)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import unit_norm


def pairwise_differences(features: jax.Array) -> jax.Array:
    """(batch, n_points, dim) -> (batch, dim, n_points, n_points)
    (reference ``pointcloud.py:25-28``)."""
    diff = features[:, None, :, :] - features[:, :, None, :]
    return jnp.transpose(diff, (0, 3, 1, 2))


def flattened_upper_triangular(x: jax.Array) -> jax.Array:
    batch, dim, a, b = x.shape
    rows, cols = np.triu_indices(a, k=1)
    return x[:, :, rows, cols]


class CanonicalOrdering:
    """Order points by a fixed 1-d random projection (reference
    ``pointcloud.py:39-69``)."""

    def __init__(
        self,
        embedding_dim: int,
        transform: Optional[jnp.ndarray] = None,
        seed: int = 0,
    ):
        self.embedding_dim = embedding_dim
        if transform is not None:
            self.projection = jnp.asarray(transform).reshape(embedding_dim, 1)
        else:
            self.projection = jax.random.uniform(
                jax.random.PRNGKey(seed),
                (embedding_dim, 1),
                minval=-1.0,
                maxval=1.0,
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        z = x @ self.projection  # (batch, n_points, 1)
        indices = jnp.argsort(z, axis=1)
        return jnp.take_along_axis(x, indices, axis=1)


class GraphEdgeEmbedding:
    """Canonical order -> pairwise diffs -> upper triangle -> random
    projection (reference ``pointcloud.py:73-101``)."""

    def __init__(
        self, n_items: int, embedding_dim: int, out_channels: int, seed: int = 0
    ):
        self.ordering = CanonicalOrdering(embedding_dim, seed=seed)
        self.embedding_dim = embedding_dim
        self.out_channels = out_channels
        self.upper_triangular = n_items * (n_items - 1) // 2
        self.total_edge_dim = self.upper_triangular * embedding_dim
        self.projection = jax.random.normal(
            jax.random.PRNGKey(seed + 1),
            (self.total_edge_dim, out_channels),
        ) / np.sqrt(self.total_edge_dim)

    def __call__(self, embeddings: jax.Array) -> jax.Array:
        batch = embeddings.shape[0]
        ordered = self.ordering(embeddings)
        diff = pairwise_differences(ordered)
        fut = flattened_upper_triangular(diff).reshape(
            batch, self.total_edge_dim
        )
        return unit_norm(fut @ self.projection)
