"""Parallelism layer: device mesh + sharding utilities, data-parallel
training, and dictionary-sharded matching pursuit (SURVEY.md §2.6 TPU-native
plan — new design; the reference is single-device)."""

from .mesh import make_mesh, batch_sharding, replicated
from .dp import make_data_parallel_step, shard_batch
from .dict_shard import sharded_sparse_code, sharded_mp_correlate

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "make_data_parallel_step",
    "shard_batch",
    "sharded_sparse_code",
    "sharded_mp_correlate",
]
