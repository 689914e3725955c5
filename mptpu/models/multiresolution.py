"""Legacy multiresolution codec shells (reference
``modules/multiresolution.py:15-185``): per-band encoders over a
psychoacoustic feature dict + a summarizer; per-band decoders recomposed
to audio. Kept for capability parity with old experiments."""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.decompose import fft_frequency_recompose
from ..nn.linear import LinearOutputStack
from ..nn.upsample import ConvUpsample


class BandEncoder(nn.Module):
    """Per-band periodicity-feature encoder (reference ``:15-40``)."""

    channels: int
    periodicity_feature_size: int
    periodicity_channels: int = 8

    @nn.compact
    def __call__(self, x):
        batch = x.shape[0]
        x = x.reshape(batch, 64, -1, self.periodicity_feature_size)
        frames = x.shape[2]
        x = LinearOutputStack(
            self.channels,
            layers=3,
            in_channels=self.periodicity_feature_size,
            out_channels=self.periodicity_channels,
        )(x)
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(batch, -1, frames)


class EncoderShell(nn.Module):
    """Encode each band of a feature dict, concatenate, summarize
    (reference ``:43-84``)."""

    channels: int
    band_feature_sizes: Dict[int, int]  # band key -> periodicity size
    latent_dim: int = 128

    @nn.compact
    def __call__(self, x: Dict[int, jax.Array]):
        encodings = []
        for k in sorted(self.band_feature_sizes.keys()):
            enc = BandEncoder(
                self.channels, self.band_feature_sizes[k], name=f"band_{k}"
            )(x[k])
            encodings.append(enc)
        encodings = jnp.concatenate(encodings, axis=-1)
        # summarizer: pool over time, project
        pooled = jnp.mean(encodings, axis=-1)
        return LinearOutputStack(
            self.channels,
            layers=2,
            in_channels=pooled.shape[-1],
            out_channels=self.latent_dim,
            name="summarizer",
        )(pooled)


class ConvBandDecoder(nn.Module):
    """Latent -> one band's audio via conv upsampling (reference
    ``:87-130``)."""

    channels: int
    band_size: int
    latent_dim: int = 128

    @nn.compact
    def __call__(self, z):
        start = max(4, self.band_size // 64)
        out = ConvUpsample(
            self.latent_dim,
            self.channels,
            start_size=start,
            end_size=self.band_size,
            mode="nearest",
            out_channels=1,
            from_latent=True,
        )(z)
        return out.reshape(-1, 1, self.band_size)


class DecoderShell(nn.Module):
    """Latent -> all bands -> recomposed audio (reference ``:163-185``)."""

    channels: int
    band_sizes: tuple
    n_samples: int
    latent_dim: int = 128

    @nn.compact
    def __call__(self, z):
        bands = {
            size: ConvBandDecoder(
                self.channels, size, self.latent_dim, name=f"band_{size}"
            )(z)
            for size in self.band_sizes
        }
        return fft_frequency_recompose(bands, self.n_samples)
