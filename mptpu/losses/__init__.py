"""L2 perceptual-loss layer (SURVEY.md §2.1 losses rows).

Parity targets: ``modules/iterative.py`` (iterative loss),
``modules/multibanddict.py:19-49`` (multiband spectrograms),
``modules/infoloss.py`` (CorrelationLoss), ``loss/least_squares.py`` +
``train/gan.py`` (GAN losses), ``loss/serial.py`` (serial / MP losses).
"""

from .iterative import iterative_loss, sort_channels_descending_norm
from .multiband_spec import (
    multiband_spectrogram,
    flattened_multiband_spectrogram,
    stft_transform,
)
from .correlation import (
    CorrelationLoss,
    correlation_loss,
    noise_loss,
    multiband_noise_loss,
    covariance,
)
from .gan import (
    least_squares_generator_loss,
    least_squares_disc_loss,
    squared_gan_loss,
)
from .serial import serial_loss, serial_matching_pursuit
from .autocorrelation import AutocorrelationLoss, DecayLoss
from .infoloss import (
    SpectralInfoLoss,
    MultiWindowSpectralInfoLoss,
    MultiBandSpectralInfoLoss,
    patches2,
)

__all__ = [
    "iterative_loss",
    "sort_channels_descending_norm",
    "multiband_spectrogram",
    "flattened_multiband_spectrogram",
    "stft_transform",
    "correlation_loss",
    "noise_loss",
    "multiband_noise_loss",
    "covariance",
    "CorrelationLoss",
    "make_gan_steps",
    "gan_cycle",
    "least_squares_generator_loss",
    "least_squares_disc_loss",
    "squared_gan_loss",
    "serial_loss",
    "AutocorrelationLoss",
    "DecayLoss",
    "serial_matching_pursuit",
    "SpectralInfoLoss",
    "MultiWindowSpectralInfoLoss",
    "MultiBandSpectralInfoLoss",
    "patches2",
]


def __getattr__(name):
    # lazy re-exports of the training-side GAN alternation: importing them
    # eagerly creates a train <-> losses circular import when mptpu.train
    # is the first package touched
    if name in ("make_gan_steps", "gan_cycle"):
        from ..train import gan

        return getattr(gan, name)
    raise AttributeError(name)
