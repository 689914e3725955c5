"""Impulse (attack transient) generation: conv-upsampled latent -> framewise
noise filters -> filtered noise * envelope (reference
``modules/impulse.py:10-77`` + ``NoiseModel`` ``modules/ddsp.py:365-430``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.upsample import interpolate_last_axis
from ..nn.linear import LinearOutputStack
from ..nn.upsample import ConvUpsample
from ..nn.init import uniform_init
from .ddsp import noise_bank2


class NoiseModel(nn.Module):
    """(batch, input_channels, input_size) -> filtered noise audio
    (reference ``ddsp.py:365-430``)."""

    input_channels: int
    input_size: int
    n_noise_frames: int
    n_audio_samples: int
    channels: int
    squared: bool = False
    mask_after: int | None = None
    activation: str = "clamp"

    @nn.compact
    def __call__(self, x, rng_key):
        batch_size = x.shape[0]
        noise_step = self.n_audio_samples // self.n_noise_frames
        noise_window = noise_step * 2
        noise_coeffs = noise_window // 2 + 1

        x = x.reshape(batch_size, self.input_channels, self.input_size)
        x = ConvUpsample(
            self.input_channels,
            self.channels,
            start_size=self.input_size,
            end_size=self.n_noise_frames,
            mode="learned",
            out_channels=noise_coeffs,
            from_latent=False,
        )(x)
        if self.activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        else:
            x = jnp.clip(x, -1.0, 1.0)
        if self.squared:
            x = x**2
        if self.mask_after is not None:
            x = x.at[:, : self.mask_after, :].set(1.0)
        return noise_bank2(rng_key, x)


class GenerateMix(nn.Module):
    """Latent -> per-event softmax mix (reference ``impulse.py:10-26``)."""

    latent_dim: int
    channels: int
    encoding_channels: int
    mixer_channels: int = 2

    @nn.compact
    def __call__(self, x):
        x = LinearOutputStack(
            self.channels,
            3,
            out_channels=self.mixer_channels,
            in_channels=self.latent_dim,
        )(x)
        x = x.reshape(-1, self.encoding_channels, 1)
        return jax.nn.softmax(x, axis=-1)


class GenerateImpulse(nn.Module):
    """Latent -> noise-band transient with squared envelope (reference
    ``impulse.py:28-77``)."""

    latent_dim: int
    channels: int
    n_samples: int
    n_filter_bands: int
    encoding_channels: int

    @nn.compact
    def __call__(self, x, rng_key):
        batch_size = x.shape[0]
        n_frames = self.n_samples // 256

        env = nn.Dense(
            n_frames,
            kernel_init=uniform_init(0.1),
            bias_init=nn.initializers.zeros,
        )(x) ** 2
        env = interpolate_last_axis(env, self.n_samples)

        h = ConvUpsample(
            self.latent_dim,
            self.channels,
            start_size=4,
            end_size=n_frames,
            mode="learned",
            out_channels=self.channels,
            from_latent=True,
        )(x)
        h = NoiseModel(
            self.channels,
            n_frames,
            n_frames * 4,
            self.n_samples,
            self.channels,
            squared=True,
            mask_after=1,
            activation="sigmoid",
        )(h, rng_key)
        h = h.reshape(batch_size, -1, self.n_samples)
        return h * env
