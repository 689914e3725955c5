"""Room acoustics by blockwise frequency-domain transfer on a voxel grid
(reference ``roomsim.py:106-211`` and the unfinished ``voxel.py``
``RoomModel``).

The room is a 3-D grid of per-voxel transfer functions over a block
spectrum. Each frame: inject the control signal's energy, apply the
transfer in the frequency domain, record the spatial sum, then
propagate energy to neighbors with a 3x3x3 averaging kernel behind
reflecting walls.

TPU-first notes: the frame loop is a ``lax.scan`` whose carry is the
whole room state; the rFFT rides :mod:`mptpu.ops.fft` (static ortho
scaling — the axon backend can't trace ``norm="ortho"``); neighbor
averaging is one ``lax.reduce_window`` after a reflect pad. The
reference's propagation step is broken scratch code (``roomsim.py:195``
collapses the state with a full ``mean``; its ``unfold`` result is
unused) — this implements the documented intent (``roomsim.py:128-137``)
instead: a neighborhood average with perfectly-reflecting boundaries.

``voxel.py``'s ``RoomModel.forward`` is literally ``pass`` upstream;
:class:`RoomModel` here completes the evident design: learned per-voxel
transfer + a sparse learned performance (energy injections over time),
rendered through the same simulator so the whole room is differentiable.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..nn.init import uniform_range_init
from ..ops.fft import irfft, rfft


def _neighbor_average(state: jax.Array) -> jax.Array:
    """3x3(x3) mean over the spatial dims of (block, W, H, D); reflecting
    boundaries; spatial dims of size 1 are left alone."""
    pads = [(0, 0)] + [
        (1, 1) if s > 1 else (0, 0) for s in state.shape[1:]
    ]
    padded = jnp.pad(state, pads, mode="reflect")
    window = [1] + [3 if s > 1 else 1 for s in state.shape[1:]]
    summed = lax.reduce_window(
        padded, 0.0, lax.add, window, [1] * state.ndim, "VALID"
    )
    count = 1
    for w in window:
        count *= w
    return summed / count


def roomsim(
    transfer: jax.Array,
    control_signal: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Run the simulation (reference ``roomsim.py:106-211``).

    transfer: (n_coeffs, W, H, D) real gains in [0, 1);
    control_signal: (n_frames, blocksize, W, H, D) energy injections.

    Returns (recording (n_frames * blocksize,), display frames
    (n_frames, W, H) — the per-voxel block norm at the middle depth
    slice, reference ``roomsim.py:170-172``)."""
    n_frames, blocksize = control_signal.shape[:2]
    mid_depth = control_signal.shape[-1] // 2

    def step(state, control):
        state = state + control
        display = jnp.linalg.norm(state[:, :, :, mid_depth], axis=0)
        spec = rfft(state, axis=0, norm="ortho")
        state = irfft(transfer * spec, n=blocksize, axis=0, norm="ortho")
        recorded = jnp.sum(state, axis=(1, 2, 3))
        state = _neighbor_average(state)
        return state, (recorded, display)

    init = jnp.zeros_like(control_signal[0])
    _, (recording, frames) = lax.scan(step, init, control_signal)
    return recording.reshape(-1), frames


class RoomModel(nn.Module):
    """Learnable 2-D room (the unfinished ``voxel.py:7-25`` completed):
    per-voxel transfer gains + a learned performance of energy
    injections, rendered through :func:`roomsim`."""

    room_size: int
    voxel_size: int
    n_frames: int

    @nn.compact
    def __call__(self) -> jax.Array:
        n_coeffs = self.voxel_size // 2 + 1
        responses = self.param(
            "responses",
            uniform_range_init(1e-12, 0.9),
            (n_coeffs, self.room_size, self.room_size),
        )
        performance = self.param(
            "performance",
            uniform_range_init(-0.01, 0.01),
            (self.n_frames, self.voxel_size, self.room_size, self.room_size),
        )
        # depth-1 3-D grid so the 2-D room shares the simulator core
        transfer = jnp.clip(responses, 0.0, 1.0)[..., None]
        control = performance[..., None]
        recording, _ = roomsim(transfer, control)
        return recording.reshape(1, 1, -1)
