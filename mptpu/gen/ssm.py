"""State-space model synthesis.

The reference's per-frame python loop (``modules/ssm.py:92-111``,
``modules/eventgenerators/ssm.py:64-80``) becomes a ``jax.lax.scan`` —
the exact pattern the reference author already proved out in
``goojax.py:190`` — so the whole recurrence is one compiled XLA while-loop
feeding the MXU with (batch, dim) x (dim, dim) matmuls.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from ..ops.overlap_add import overlap_add
from ..nn.init import uniform_init
from .generator import EventGenerator, ShapeSpec
from .schedule import DiracScheduler

MAX_EFFICIENCY = 0.999


def ssm_scan(
    proj: jax.Array,          # (batch, frames, input_dim)
    state_matrix: jax.Array,  # (state, state) or (batch, state, state)
    input_matrix: jax.Array,  # (input, state) or batched
    output_matrix: jax.Array, # (state, input) or batched
    direct_matrix: jax.Array, # (input, input) or batched
    state_dim: int,
) -> jax.Array:
    """Core recurrence: state' = state @ A + inp @ B; out = state@C + inp@D.

    Matches reference ``modules/ssm.py:92-111`` (whose
    ``project_and_limit_norm`` is a plain matmul — the norm clamp is dead
    code after the early return, ``ssm.py:20-21``).
    """
    batch, frames, input_dim = proj.shape

    def mat(v, m):
        if m.ndim == 3:
            return jnp.einsum("bi,bij->bj", v, m)
        return v @ m

    def step(state_vec, inp):
        state_vec = mat(state_vec, state_matrix)
        b = mat(inp, input_matrix)
        c = mat(state_vec, output_matrix)
        d = mat(inp, direct_matrix)
        state_vec = state_vec + b
        output = c + d
        return state_vec, output

    init = jnp.zeros((batch, state_dim), proj.dtype)
    _, outputs = lax.scan(step, init, jnp.swapaxes(proj, 0, 1))
    return jnp.swapaxes(outputs, 0, 1)  # (batch, frames, input_dim)


def state_space_model(
    control: jax.Array,  # (batch, control_plane_dim, frames)
    proj_matrix: jax.Array,
    state_matrix: jax.Array,
    input_matrix: jax.Array,
    output_matrix: jax.Array,
    direct_matrix: jax.Array,
    state_matrix_dim: int,
    input_dim: int,
    n_samples: int,
    windowed: bool = True,
) -> jax.Array:
    """control -> audio via scan + overlap-add (reference
    ``eventgenerators/ssm.py:40-86``)."""
    control = jnp.swapaxes(control, 1, 2)  # (batch, frames, cpd)
    if proj_matrix.ndim == 3:
        proj = jnp.einsum("bfc,bci->bfi", control, proj_matrix)
    else:
        proj = control @ proj_matrix
    frames_out = ssm_scan(
        proj, state_matrix, input_matrix, output_matrix, direct_matrix,
        state_matrix_dim,
    )
    result = frames_out[:, None, :, :]  # (batch, 1, frames, input_dim)
    audio = overlap_add(result, apply_window=windowed)
    return audio[..., :n_samples]


class SSM(nn.Module):
    """5-matrix SSM with learnable matrices (reference
    ``modules/ssm.py:36-117``). (batch, control_plane_dim, frames) ->
    (batch, 1, frames * input_dim // 2)."""

    control_plane_dim: int
    input_dim: int
    state_matrix_dim: int
    windowed: bool = True

    @nn.compact
    def __call__(self, control: jax.Array) -> jax.Array:
        init = uniform_init(0.01)
        proj = self.param(
            "proj", init, (self.control_plane_dim, self.input_dim)
        )
        state_matrix = self.param(
            "state_matrix", init, (self.state_matrix_dim, self.state_matrix_dim)
        )
        input_matrix = self.param(
            "input_matrix", init, (self.input_dim, self.state_matrix_dim)
        )
        output_matrix = self.param(
            "output_matrix", init, (self.state_matrix_dim, self.input_dim)
        )
        direct_matrix = self.param(
            "direct_matrix", init, (self.input_dim, self.input_dim)
        )
        frames = control.shape[-1]
        return state_space_model(
            control,
            proj,
            state_matrix,
            input_matrix,
            output_matrix,
            direct_matrix,
            self.state_matrix_dim,
            self.input_dim,
            frames * (self.input_dim // 2),
            windowed=self.windowed,
        )


class HyperNetworkLayer(nn.Module):
    """Factorized weight generator: latent -> (in, out) matrix (reference
    ``modules/hypernetwork.py:5-53``)."""

    latent_channels: int
    layer_latent: int
    layer_in_channels: int
    layer_out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = nn.Dense(
            self.layer_latent * self.layer_in_channels,
            kernel_init=uniform_init(0.1),
        )(x).reshape(-1, self.layer_in_channels, self.layer_latent)
        b = nn.Dense(
            self.layer_latent * self.layer_out_channels,
            kernel_init=uniform_init(0.1),
        )(x).reshape(-1, self.layer_latent, self.layer_out_channels)
        return a @ b


class StateSpaceModelEventGenerator(nn.Module, EventGenerator):
    """SSM whose five matrices are produced by hypernetworks from per-event
    latents (reference ``eventgenerators/ssm.py:89-178``)."""

    context_dim: int
    control_plane_dim: int
    input_dim: int
    state_dim: int
    hypernetwork_dim: int
    hypernetwork_latent: int
    n_samples: int
    samplerate: int
    n_frames: int

    @property
    def shape_spec(self) -> ShapeSpec:
        return dict(
            control_signal=(self.control_plane_dim, self.n_frames),
            state_matrix_hypervector=(1, self.hypernetwork_dim),
            output_matrix_hypervector=(1, self.hypernetwork_dim),
            input_matrix_hypervector=(1, self.hypernetwork_dim),
            direct_matrix_hypervector=(1, self.hypernetwork_dim),
            proj_matrix_hypervector=(1, self.hypernetwork_dim),
            times=(self.n_frames,),
        )

    @nn.compact
    def __call__(self, params: Dict[str, jax.Array]) -> jax.Array:
        control_signal = jax.nn.relu(params["control_signal"])

        def hyper(name, inc, outc, vec):
            return HyperNetworkLayer(
                self.hypernetwork_dim, self.hypernetwork_latent, inc, outc,
                name=name,
            )(vec.reshape(-1, self.hypernetwork_dim))

        state_m = hyper("state", self.state_dim, self.state_dim,
                        params["state_matrix_hypervector"])
        input_m = hyper("input", self.input_dim, self.state_dim,
                        params["input_matrix_hypervector"])
        output_m = hyper("output", self.state_dim, self.input_dim,
                         params["output_matrix_hypervector"])
        direct_m = hyper("direct", self.input_dim, self.input_dim,
                         params["direct_matrix_hypervector"])
        proj_m = hyper("proj", self.control_plane_dim, self.input_dim,
                       params["proj_matrix_hypervector"])

        final = state_space_model(
            control_signal.reshape(-1, self.control_plane_dim, self.n_frames),
            proj_m,
            state_m,
            input_m,
            output_m,
            direct_m,
            state_matrix_dim=self.state_dim,
            input_dim=self.input_dim,
            n_samples=self.n_samples,
        )
        scheduler = DiracScheduler(1, self.n_frames, self.n_samples)
        batch = params["control_signal"].shape[0]
        final = final.reshape(batch, -1, self.n_samples)
        return scheduler.schedule(params["times"][:, :, :], final)
