"""Complex-spectral SSM variant (reference ``ssmcompression.py:68-190``):
the control frames move through rFFT space, all five matrices are complex,
and frames return to time domain via irFFT before overlap-add — sized as a
*compression* model (param count is the codec rate)."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.overlap_add import overlap_add


def _complex_uniform(key, shape, lo=-0.01, hi=0.01):
    from ..ops.fft import to_complex

    kr, ki = jax.random.split(key)
    return to_complex(
        jax.random.uniform(kr, shape, minval=lo, maxval=hi),
        jax.random.uniform(ki, shape, minval=lo, maxval=hi),
    )


class ComplexSSM(nn.Module):
    """(batch, control_plane_dim, frames) -> (batch, 1, frames * input_dim // 2).

    With ``complex_domain=True`` the recurrence runs on rFFT coefficients
    (dims become d//2+1) — reference ``ssmcompression.py:77-87,125-170``.
    """

    control_plane_dim: int
    input_dim: int
    state_matrix_dim: int
    complex_domain: bool = True
    windowed: bool = True

    @nn.compact
    def __call__(self, control: jax.Array) -> jax.Array:
        batch, cpd, frames = control.shape
        n_samples = frames * (self.input_dim // 2)

        if self.complex_domain:
            cdim = self.control_plane_dim // 2 + 1
            idim = self.input_dim // 2 + 1
            sdim = self.state_matrix_dim // 2 + 1
            init = lambda key, shape: _complex_uniform(key, shape)
            dtype = jnp.complex64
        else:
            cdim, idim, sdim = (
                self.control_plane_dim,
                self.input_dim,
                self.state_matrix_dim,
            )
            init = lambda key, shape: jax.random.uniform(
                key, shape, minval=-0.01, maxval=0.01
            )
            dtype = jnp.float32

        proj = self.param("proj", init, (cdim, idim))
        state_m = self.param("state_matrix", init, (sdim, sdim))
        input_m = self.param("input_matrix", init, (idim, sdim))
        output_m = self.param("output_matrix", init, (sdim, idim))
        direct_m = self.param("direct_matrix", init, (idim, idim))

        x = jnp.swapaxes(control, 1, 2)  # (batch, frames, cpd)
        if self.complex_domain:
            x = jnp.fft.rfft(x, axis=-1)
        h = x @ proj  # (batch, frames, idim)

        def step(state, inp):
            # reference order (ssmcompression.py:146-158): the output taps
            # the state *before* the new input is added
            state = state @ state_m
            b = inp @ input_m
            c = state @ output_m
            d = inp @ direct_m
            return state + b, c + d

        if self.complex_domain:
            from ..ops.fft import to_complex

            z = jnp.zeros((batch, sdim))
            s0 = to_complex(z, z)
        else:
            s0 = jnp.zeros((batch, sdim), dtype)
        _, outs = lax.scan(step, s0, jnp.swapaxes(h, 0, 1))
        outs = jnp.swapaxes(outs, 0, 1)  # (batch, frames, idim)

        result = outs[:, None, :, :]
        if self.complex_domain:
            result = jnp.fft.irfft(result, n=self.input_dim, axis=-1)
        audio = overlap_add(result, apply_window=self.windowed)
        return audio[..., :n_samples]


class CompressionModel(nn.Module):
    """OverfitControlPlane sized as a codec (reference
    ``ssmcompression.py:172-220``): n_samples 2^17, window 1024, control
    32, state 64 by default; ``param_count`` is the compressed size."""

    control_plane_dim: int = 32
    input_dim: int = 1024
    state_matrix_dim: int = 64
    n_samples: int = 2**17
    complex_domain: bool = True

    @property
    def n_frames(self) -> int:
        return self.n_samples // (self.input_dim // 2)

    @nn.compact
    def __call__(self, sig=None):
        control = self.param(
            "control",
            lambda k, s: jax.random.uniform(k, s, minval=-0.01, maxval=0.01),
            (1, self.control_plane_dim, self.n_frames),
        )
        cp = sig if sig is not None else jax.nn.relu(control)
        return ComplexSSM(
            self.control_plane_dim,
            self.input_dim,
            self.state_matrix_dim,
            complex_domain=self.complex_domain,
            name="ssm",
        )(cp)


def param_count(params) -> int:
    total = 0
    for x in jax.tree_util.tree_leaves(params):
        n = int(np.prod(x.shape))
        if jnp.iscomplexobj(x):
            n *= 2
        total += n
    return total
