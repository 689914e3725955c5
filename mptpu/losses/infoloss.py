"""Learned-centroid spectral info losses (reference
``modules/infoloss.py:108-297``): spectrogram patches quantized against
learned centroids via straight-through softmax; the loss is class-weighted
cross-entropy between target and reconstruction codes plus a coarse norm
term. Multi-window and multi-band wrappers match the reference's."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.decompose import fft_frequency_decompose
from ..ops.norms import unit_norm
from ..ops.ste import sparse_softmax
from ..ops.stft import stft, _frame
from ..nn.init import uniform_init


def patches2(
    spec: jax.Array, size: Tuple[int, int], step: Tuple[int, int]
):
    """Unfold 2-d patches of a (batch, channels, time) spectrogram and take
    their 2-d rFFT magnitudes (reference ``infoloss.py:118-132``)."""
    batch = spec.shape[0]
    w, h = size
    ws, hs = step
    # unfold dim 1 then dim 2
    n1 = (spec.shape[1] - w) // ws + 1
    n2 = (spec.shape[2] - h) // hs + 1
    i1 = (jnp.arange(n1) * ws)[:, None] + jnp.arange(w)[None, :]
    i2 = (jnp.arange(n2) * hs)[:, None] + jnp.arange(h)[None, :]
    p = spec[:, i1][:, :, :, i2]            # (batch, n1, w, n2, h)
    p = jnp.transpose(p, (0, 1, 3, 2, 4))   # (batch, n1, n2, w, h)
    fft2 = jnp.fft.rfft2(p, axes=(-1, -2))
    p = jnp.abs(fft2)
    final_size = (w // 2 + 1) * h
    p = p.reshape(batch, -1, final_size)
    norms = jnp.linalg.norm(p, axis=-1, keepdims=True)
    return p, norms, p / (norms + 1e-12)


class SpectralInfoLoss(nn.Module):
    """(reference ``infoloss.py:211-297``)"""

    stft_window_size: int = 2048
    stft_step_size: int = 256
    patch_size: Tuple[int, int] = (16, 16)
    patch_step: Tuple[int, int] = (8, 8)
    embedding_channels: int = 32
    n_centroids: int = 1024

    def _encode(self, layers, signal):
        patch_embed, proj, up = layers
        start_channels = self.stft_window_size // 2 + 1
        if signal.shape[1] != 1:
            spec = signal.reshape(-1, signal.shape[1], start_channels)
        else:
            frames = signal.shape[-1] // self.stft_step_size
            spec = stft(
                signal, self.stft_window_size, self.stft_step_size, pad=True
            ).reshape(-1, frames, start_channels)

        raw, norms, normed = patches2(spec, self.patch_size, self.patch_step)
        x = up(proj(patch_embed(normed)))
        one_hot = sparse_softmax(x, normalize=True, axis=-1)
        codes = jnp.argmax(x, axis=-1)
        counts = jnp.bincount(
            codes.reshape(-1), minlength=self.n_centroids,
            length=self.n_centroids,
        ) + 1
        weights = 1.0 / (counts / codes.size)
        return one_hot, codes, weights, norms, normed, raw

    @nn.compact
    def __call__(self, target: jax.Array, recon: jax.Array) -> jax.Array:
        kw = dict(kernel_init=uniform_init(0.02), bias_init=nn.initializers.zeros)
        layers = (
            nn.Dense(self.embedding_channels, name="patch_embed", **kw),
            nn.Dense(self.embedding_channels, name="proj", **kw),
            nn.Dense(self.n_centroids, name="up", **kw),
        )
        toh, tc, tw, tnorms, _, _ = self._encode(layers, target)
        foh, fc, fw, fnorms, _, _ = self._encode(layers, recon)
        # class-weighted cross entropy of recon logits vs target codes
        logits = foh.reshape(-1, self.n_centroids)
        labels = tc.reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        w = tw[labels]
        cat_loss = -jnp.sum(picked * w) / (jnp.sum(w) + 1e-8)
        coarse = jnp.mean(
            (fnorms - jax.lax.stop_gradient(tnorms)) ** 2
        ) * 1e-3
        return cat_loss + coarse


class MultiWindowSpectralInfoLoss(nn.Module):
    """(reference ``infoloss.py:146-159``)"""

    specs: Sequence[Tuple[Tuple[int, int], Tuple[int, int]]] = (
        ((16, 16), (8, 8)),
    )

    @nn.compact
    def __call__(self, target, recon):
        total = 0.0
        for i, (size, step) in enumerate(self.specs):
            total = total + SpectralInfoLoss(
                2048, 256, patch_size=size, patch_step=step,
                n_centroids=256, name=f"model_{i}",
            )(target, recon)
        return total


class MultiBandSpectralInfoLoss(nn.Module):
    """Per-octave-band info loss (reference ``infoloss.py:173-208``)."""

    band_sizes: Sequence[int] = (512, 1024, 2048)
    stft_window_size: int = 512
    stft_step_size: int = 64

    @nn.compact
    def __call__(self, target, recon):
        tb = fft_frequency_decompose(target, min(self.band_sizes))
        rb = fft_frequency_decompose(recon, min(self.band_sizes))
        total = 0.0
        for size in self.band_sizes:
            total = total + SpectralInfoLoss(
                self.stft_window_size,
                self.stft_step_size,
                n_centroids=256,
                name=f"band_{size}",
            )(tb[size], rb[size])
        return total
