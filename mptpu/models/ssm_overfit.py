"""Playable state-space instrument model (BASELINE config #5).

Capability parity with reference ``ssm.py:155-320`` (``InstrumentModel``
with an RNN recurrence + ``OverfitControlPlane`` holding a learnable sparse
control plane) and ``modules/ssm.py:121-164``. The RNN is a ``lax.scan``
(tanh recurrence, no biases — exactly torch ``nn.RNN(bias=False)``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.norms import max_norm
from ..sparse.topk import sparsify
from ..nn.init import uniform_init


class InstrumentModel(nn.Module):
    """(batch, control_plane, frames) -> ((batch, 1, frames*window), frame
    boundary diffs) (reference ``ssm.py:155-223``)."""

    control_plane_dim: int
    input_dim: int
    state_matrix_dim: int
    window_size: int

    @nn.compact
    def __call__(self, control: jax.Array) -> Tuple[jax.Array, jax.Array]:
        batch, cpd, frames = control.shape
        control = jnp.swapaxes(control, 1, 2)  # (batch, frames, cpd)

        proj_m = self.param(
            "proj", uniform_init(0.01), (self.control_plane_dim, self.input_dim)
        )
        proj = control @ proj_m  # (batch, frames, input_dim)

        # torch nn.RNN(bias=False, tanh): h_t = tanh(x_t @ W_ih^T + h @ W_hh^T)
        w_ih = self.param(
            "w_ih", uniform_init(0.1), (self.input_dim, self.state_matrix_dim)
        )
        w_hh = self.param(
            "w_hh", uniform_init(0.1), (self.state_matrix_dim, self.state_matrix_dim)
        )

        def step(h, x):
            h = jnp.tanh(x @ w_ih + h @ w_hh)
            return h, h

        h0 = jnp.zeros((batch, self.state_matrix_dim), proj.dtype)
        _, states = lax.scan(step, h0, jnp.swapaxes(proj, 0, 1))
        states = jnp.swapaxes(states, 0, 1)  # (batch, frames, state)

        out_proj = self.param(
            "out_proj", uniform_init(0.1), (self.state_matrix_dim, self.window_size)
        )
        x = states @ out_proj  # (batch, frames, window)
        result = x.reshape(batch, 1, -1)

        # frame-boundary continuity term (reference ``ssm.py:214-219``)
        frames_view = x
        end_values = frames_view[:, :-1, -1]
        start_values = frames_view[:, 1:, 0]
        diff = start_values - end_values
        return result, diff


class OverfitControlPlane(nn.Module):
    """Learnable sparse control plane + instrument (reference
    ``ssm.py:247-320``, ``modules/ssm.py:121-164``)."""

    control_plane_dim: int
    input_dim: int
    state_matrix_dim: int
    n_samples: int
    window_size: int
    n_active_sites: Optional[int] = None

    @property
    def n_frames(self) -> int:
        return self.n_samples // self.window_size

    def _instrument(self):
        return InstrumentModel(
            self.control_plane_dim,
            self.input_dim,
            self.state_matrix_dim,
            self.window_size,
            name="ssm",
        )

    def control_signal(self, control: jax.Array) -> jax.Array:
        if self.n_active_sites is not None:
            control = sparsify(control, n_to_keep=self.n_active_sites)
        return jax.nn.relu(control)

    @nn.compact
    def __call__(self, sig: Optional[jax.Array] = None):
        control = self.param(
            "control",
            lambda k, s: jax.random.uniform(k, s, minval=0.0, maxval=0.1),
            (1, self.control_plane_dim, self.n_frames),
        )
        cp = sig if sig is not None else self.control_signal(control)
        return self._instrument()(cp)

    def random(self, key: jax.Array, p: float = 0.0001):
        """Random sparse control signal -> audio (reference
        ``ssm.py:316-330``)."""
        shape = (1, self.control_plane_dim, self.n_frames)
        cp = jax.random.bernoulli(key, p, shape).astype(jnp.float32)
        audio, _ = self(sig=cp)
        return max_norm(audio)

    def rolled_control_plane(self, key: jax.Array, control: jax.Array):
        indices = jax.random.permutation(key, self.control_plane_dim)
        cp = self.control_signal(control)[:, indices, :]
        audio, _ = self(sig=cp)
        return max_norm(audio)
