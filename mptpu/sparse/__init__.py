"""L1 sparse-coding layer: top-k sparsify family, greedy matching pursuit +
dictionary learning, multiband dictionary learning.

TPU-native re-design of reference ``modules/{sparse,matchingpursuit,
multibanddict,quantize}.py`` (SURVEY.md §2.1).
"""

from .topk import (
    sparsify,
    sparsify2,
    sparsify_vectors,
    encourage_sparsity_loss,
    to_key_points,
    ElementwiseSparsity,
    VectorwiseSparsity,
)
from .matching_pursuit import (
    sparse_code,
    dictionary_learning_step,
    sparse_feature_map,
    sparse_coding_loss,
    flatten_atom_dict,
    SparseCodingLoss,
    AtomPlacement,
    scatter_events,
    reconstruct_from_events,
    SparseCodeResult,
)
from .omp_refit import omp_refit, event_tracks
from .fast_mp import sparse_code_fast, dictionary_gram
from .quantize import select_items, hard_choice, QuantizedResonanceMixture
from .multiband import BandSpec, MultibandDictionaryLearning

__all__ = [
    "sparsify",
    "sparsify2",
    "sparsify_vectors",
    "encourage_sparsity_loss",
    "to_key_points",
    "ElementwiseSparsity",
    "VectorwiseSparsity",
    "sparse_code",
    "dictionary_learning_step",
    "sparse_feature_map",
    "sparse_coding_loss",
    "flatten_atom_dict",
    "SparseCodingLoss",
    "AtomPlacement",
    "scatter_events",
    "reconstruct_from_events",
    "SparseCodeResult",
    "omp_refit",
    "event_tracks",
    "sparse_code_fast",
    "dictionary_gram",
    "select_items",
    "hard_choice",
    "QuantizedResonanceMixture",
    "BandSpec",
    "MultibandDictionaryLearning",
]
