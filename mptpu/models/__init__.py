"""Flagship model assemblies (SURVEY.md §0 five workloads)."""

from .splat_overfit import OverfitHierarchicalEvents, splat_loss_transform
from .ssm_overfit import InstrumentModel, OverfitControlPlane
from .siam import SIAMModel, refit_event_gains, refine_event_alignment
from .pointcloud import CanonicalOrdering, GraphEdgeEmbedding, pairwise_differences
from .search import BruteForceSearch, k_nearest, build_index
from .mp_model import MatchingPursuit
from .multiresolution import BandEncoder, EncoderShell, ConvBandDecoder, DecoderShell
from .inference import SIAMCodec, SIAMEncoding
from .instrument import PlayableInstrument, damped_sequential
from .songsplat import SongSplatModel
from .funcsong import FuncSong, song_pos_encoding
from .textural import TexturalModel, confidence_loss
from .audiooperator import (
    AudioOperator,
    band_pos_encode,
    envelope_loss,
    generate_training_batch,
)

__all__ = [
    "PlayableInstrument",
    "damped_sequential",
    "SongSplatModel",
    "OverfitHierarchicalEvents",
    "splat_loss_transform",
    "InstrumentModel",
    "OverfitControlPlane",
    "SIAMModel",
    "refit_event_gains",
    "refine_event_alignment",
    "CanonicalOrdering",
    "GraphEdgeEmbedding",
    "pairwise_differences",
    "BruteForceSearch",
    "k_nearest",
    "build_index",
    "MatchingPursuit",
    "BandEncoder",
    "EncoderShell",
    "ConvBandDecoder",
    "DecoderShell",
    "SIAMCodec",
    "SIAMEncoding",
    "TexturalModel",
    "confidence_loss",
    "FuncSong",
    "song_pos_encoding",
    "AudioOperator",
    "band_pos_encode",
    "envelope_loss",
    "generate_training_batch",
]
