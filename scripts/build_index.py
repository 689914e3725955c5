"""Build a similarity index of event embeddings over dataset chunks and
query it (reference ``search.py:29-52`` + ``hyperdimensionalsearch.py``).

Embeddings: multiband MP event tuples projected through a random
hyperdimensional projection (no trained weights required; plug a trained
SIAM encoder in via --siam-checkpoint when available).

Usage:
  python scripts/build_index.py [--chunks 32] [--chunk-size 16384]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

import numpy as np
import jax
import jax.numpy as jnp

from mptpu.data import iter_audio_segments
from mptpu.data.kv import KVCollection
from mptpu.models import BruteForceSearch, build_index
from mptpu.sparse import BandSpec, MultibandDictionaryLearning


def make_embedder(n_samples: int, dim: int = 256, steps: int = 8):
    specs = [
        BandSpec(size, n_atoms=64, atom_size=128,
                 signal_samples=n_samples, is_lowest_band=(size == 512))
        for size in [512, 1024, 2048, 4096, 8192, 16384]
        if size <= n_samples
    ]
    model = MultibandDictionaryLearning(specs, n_samples)
    proj = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(1), (model.total_atoms + 2, dim)
        )
    ) / np.sqrt(model.total_atoms)

    def embed(chunk: np.ndarray) -> np.ndarray:
        enc = model.encode(jnp.asarray(chunk), steps=steps)
        gi, ut, amp = model.flattened_event_tuples(enc)
        # hyperdimensional-ish embedding: atom one-hot rows scaled by
        # amplitude + (time, amp) moments
        feats = np.zeros(model.total_atoms + 2, dtype=np.float32)
        np.add.at(feats, np.asarray(gi), np.asarray(amp))
        feats[-2] = float(jnp.mean(ut))
        feats[-1] = float(jnp.mean(amp))
        return feats @ proj

    return embed


def main(chunks: int, chunk_size: int, audio_path: str | None, query: bool):
    embed = make_embedder(chunk_size)
    segments = iter_audio_segments(audio_path, "*.wav", chunk_size)
    keys, embeddings = build_index(segments, embed, max_items=chunks)
    print(f"indexed {len(keys)} chunks")

    kv = KVCollection("trained_weights/search_index")
    kv.put("keys", "\n".join(keys).encode())
    kv.put("embeddings", np.asarray(embeddings))

    if query:
        search = BruteForceSearch(embeddings, keys, n_results=4)
        qkey, qemb = search.choose_random(seed=0)
        result_keys, _ = search.search(qemb)
        print(f"query: {qkey}")
        for k in result_keys:
            print(f"  -> {k}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--chunks", type=int, default=32)
    parser.add_argument("--chunk-size", type=int, default=16384)
    parser.add_argument("--audio-path", type=str, default=None)
    parser.add_argument("--query", action="store_true", default=True)
    args = parser.parse_args()
    main(args.chunks, args.chunk_size, args.audio_path, args.query)
