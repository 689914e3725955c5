"""Auditory front-ends (SURVEY.md §2.1 "Auditory front-ends" row):
gammatone filter banks, the auditory image model (AIM), FFT-based
phase-invariant features (PIF), and the cochlea/periodicity feature."""

from .gammatone import gammatone_filter_bank
from .aim import rectified_filter_bank, auditory_image_model, auditory_image
from .pif import fft_based_pif
from .feature import (
    CochleaModel,
    cochlea_filter_bank,
    cochlea_model,
    periodicity_feature,
)
from .filterbank import (
    morlet_filter_bank,
    mel_scale_hz,
    filter_bank_convolve,
    avg_pool_1d,
)
from .scattering import scattering_transform, MoreCorrectScattering
from .texture import AudioTextureFeatures, calculate_kurtosis
from .psychoacoustic import PsychoacousticFeature
from .distance import pif_distance

__all__ = [
    "gammatone_filter_bank",
    "rectified_filter_bank",
    "auditory_image_model",
    "auditory_image",
    "fft_based_pif",
    "cochlea_filter_bank",
    "cochlea_model",
    "periodicity_feature",
    "CochleaModel",
    "morlet_filter_bank",
    "mel_scale_hz",
    "filter_bank_convolve",
    "avg_pool_1d",
    "scattering_transform",
    "AudioTextureFeatures",
    "calculate_kurtosis",
    "MoreCorrectScattering",
    "PsychoacousticFeature",
    "pif_distance",
]
