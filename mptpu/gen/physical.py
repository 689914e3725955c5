"""Physical-modeling helpers: Gaussian windows, transfer-function segment
synthesis (reference ``modules/physical.py:27-49`` Window,
``modules/waveguide.py:105-178`` TransferFunctionSegmentGenerator)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.fft import rfft, irfft, to_complex
from ..ops.norms import max_norm
from ..ops.overlap_add import overlap_add
from ..ops.pdf import pdf
from ..ops.upsample import interpolate_last_axis
from ..ops.windows import hamming_window
from ..nn.upsample import ConvUpsample
from ..nn.linear import LinearOutputStack


def gaussian_window(
    means: jax.Array,
    stds: jax.Array,
    n_samples: int,
    mn: float = 0.0,
    mx: float = 1.0,
    epsilon: float = 1e-8,
) -> jax.Array:
    """Max-normalized gaussian windows on [0,1] (reference ``Window``,
    ``physical.py:27-49``)."""
    scale = mx - mn
    rng = jnp.linspace(0, 1, n_samples)
    windows = pdf(rng[None, None, :], mn + means * scale, epsilon + stds)
    return max_norm(windows)


class TransferFunctionSegmentGenerator(nn.Module):
    """Latent -> (noise excitation * envelope) convolved with a per-frame
    complex transfer function, norm-clamped below 1 so energy cannot grow
    (reference ``waveguide.py:105-178``)."""

    model_dim: int
    n_frames: int
    window_size: int
    n_samples: int
    cumulative: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        n_coeffs = self.window_size // 2 + 1
        x = x.reshape(-1, self.model_dim)

        env = ConvUpsample(
            self.model_dim, self.model_dim, 4, self.n_frames,
            mode="nearest", out_channels=1,
        )(x) ** 2
        env = interpolate_last_axis(env, self.n_samples)
        noise = jax.random.uniform(
            key, (1, 1, self.n_samples), minval=-1.0, maxval=1.0
        )
        env = env * noise

        if self.cumulative:
            tf = LinearOutputStack(
                self.model_dim, 3, out_channels=n_coeffs * 2
            )(x)
            tf = jnp.broadcast_to(
                tf.reshape(-1, n_coeffs * 2, 1),
                (tf.shape[0], n_coeffs * 2, self.n_frames),
            )
        else:
            tf = ConvUpsample(
                self.model_dim, self.model_dim, 4, self.n_frames,
                mode="nearest", out_channels=n_coeffs * 2,
            )(x)

        tf = tf.reshape(-1, n_coeffs, 2, self.n_frames)
        norm = jnp.linalg.norm(tf, axis=2, keepdims=True)
        unit = tf / (norm + 1e-8)
        tf = unit * jnp.clip(norm, 0, 0.9999)
        tf = tf.reshape(-1, n_coeffs * 2, self.n_frames)

        real = tf[:, :n_coeffs, :]
        imag = tf[:, n_coeffs:, :]
        tfc = to_complex(real, imag)
        if self.cumulative:
            tfc = jnp.cumprod(tfc, axis=-1)

        # irfft over the coefficient axis -> per-frame waveforms
        t = irfft(tfc, n=self.window_size, axis=1, norm="ortho")
        t = jnp.transpose(t, (0, 2, 1)).reshape(
            -1, 1, self.n_frames, self.window_size
        )
        t = t * hamming_window(self.window_size, dtype=t.dtype)
        t = overlap_add(t)[..., : self.n_samples]

        env_spec = rfft(env, axis=-1, norm="ortho")
        tf_spec = rfft(t, axis=-1, norm="ortho")
        return irfft(env_spec * tf_spec, n=self.n_samples, axis=-1, norm="ortho")
