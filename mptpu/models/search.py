"""Brute-force cosine/L2 k-NN over event embeddings (reference
``modules/search.py:6-55``) + the index-building flow of ``search.py`` /
``hyperdimensionalsearch.py``."""

from __future__ import annotations

from typing import Iterable, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def k_nearest(
    query: jax.Array, embeddings: jax.Array, n_results: int = 16
) -> jax.Array:
    """Indices of the n closest embeddings by L2 distance (reference
    ``search.py:6-16``)."""
    n_items, dim = embeddings.shape
    query = query.reshape(1, dim)
    dist = jnp.linalg.norm(embeddings - query, axis=-1)
    return jnp.argsort(dist)[:n_results]


class BruteForceSearch:
    """(reference ``modules/search.py:19-55``)"""

    def __init__(
        self,
        embeddings: jax.Array,
        keys: List[str],
        n_results: int = 16,
        visualization_dim: int = 2,
        seed: int = 0,
    ):
        self.embeddings = jnp.asarray(embeddings)
        self.keys = keys
        self.n_results = n_results
        self.visualization_dim = visualization_dim
        # orthogonal projection for 2-d visualization
        g = jax.random.normal(
            jax.random.PRNGKey(seed),
            (self.embeddings.shape[-1], visualization_dim),
        )
        q, _ = jnp.linalg.qr(g)
        self.projection = q[:, :visualization_dim]

    def __len__(self):
        return len(self.keys)

    def choose_random(self, seed: int | None = None) -> Tuple[str, jax.Array]:
        rng = np.random.default_rng(seed)
        index = int(rng.integers(len(self)))
        return self.keys[index], self.embeddings[index]

    def visualization(self) -> jax.Array:
        return self.embeddings @ self.projection

    def search(self, query: jax.Array):
        indices = k_nearest(query, self.embeddings, self.n_results)
        keys = [self.keys[int(i)] for i in np.asarray(indices)]
        return keys, self.embeddings[indices]


def build_index(
    segments: Iterable[Tuple[str, np.ndarray]],
    compute_embedding,
    max_items: int | None = None,
):
    """Build (keys, embeddings) over dataset chunks (the ``search.py:52``
    flow). ``compute_embedding(chunk) -> (dim,)``."""
    keys, embs = [], []
    for i, (key, chunk) in enumerate(segments):
        if max_items is not None and i >= max_items:
            break
        keys.append(key)
        embs.append(np.asarray(compute_embedding(chunk)).reshape(-1))
    return keys, jnp.asarray(np.stack(embs)) if embs else (keys, None)
