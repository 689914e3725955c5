"""Learned conv upsampler: latent -> (channels, end_size) signal
(reference ``ConvUpsample``, ``modules/upsample.py:152-228``)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.upsample import interpolate_last_axis, fft_upsample
from .init import uniform_init


class ConvUpsample(nn.Module):
    """latent (batch, latent_dim) -> (batch, out_channels, end_size).

    ``mode``: 'nearest' | 'linear' | 'learned' (transposed conv) | 'fft'.
    """

    latent_dim: int
    channels: int
    start_size: int
    end_size: int
    mode: str = "nearest"
    out_channels: int = 1
    from_latent: bool = True
    batch_norm: bool = False
    layer_norm: bool = False
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_layers = int(np.log2(self.end_size) - np.log2(self.start_size))
        kw = dict(
            kernel_init=uniform_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )
        if self.from_latent:
            x = x.reshape(-1, self.latent_dim)
            x = nn.Dense(self.channels * self.start_size, **kw)(x)
            x = x.reshape(-1, self.start_size, self.channels)
        else:
            # expects (batch, channels, start_size)
            x = jnp.transpose(x, (0, 2, 1))

        for _ in range(n_layers):
            if self.mode == "learned":
                # SAME padding doubles the length exactly (out = 2*in);
                # explicit [(1,1)] yields 2*in - 2 in flax's ConvTranspose
                # semantics, silently breaking every later reshape
                x = nn.ConvTranspose(
                    self.channels, (4,), strides=(2,), padding="SAME", **kw
                )(x)
            else:
                t = jnp.transpose(x, (0, 2, 1))
                if self.mode == "fft":
                    t = fft_upsample(t, 2)
                else:
                    t = interpolate_last_axis(t, t.shape[-1] * 2, mode=self.mode)
                t = jnp.transpose(t, (0, 2, 1))
                x = nn.Conv(self.channels, (3,), padding=[(1, 1)], **kw)(t)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(x)
            elif self.layer_norm:
                x = nn.LayerNorm(use_bias=False, use_scale=False)(x)
            x = jax.nn.leaky_relu(x, 0.2)

        x = nn.Conv(self.out_channels, (3,), padding=[(1, 1)], **kw)(x)
        return jnp.transpose(x, (0, 2, 1))
