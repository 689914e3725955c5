"""Mass-spring ("goo") physical simulation (capability parity with the
reference's ``goojax.py`` / ``goo.py`` / ``parallel.py`` physical models:
a network of point masses connected by damped springs, integrated with
``lax.scan``, excited by impulses, and read out at a pickup mass).

This is an original formulation (semi-implicit Euler over a spring
adjacency), not a translation: positions/velocities are (n_masses, dims)
arrays, springs an (n_springs, 2) index table with rest lengths and
stiffness, and the whole rollout is one compiled scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


class SpringMesh(NamedTuple):
    positions: jax.Array   # (n_masses, dims) rest positions
    springs: jax.Array     # (n_springs, 2) int32 endpoint indices
    rest_lengths: jax.Array  # (n_springs,)
    stiffness: jax.Array     # (n_springs,)
    damping: jax.Array       # (n_masses,) velocity damping
    fixed: jax.Array         # (n_masses,) 1.0 where immovable


def string_mesh(
    n_masses: int = 32,
    stiffness: float = 80.0,
    damping: float = 0.999,
    fixed_ends: bool = True,
) -> SpringMesh:
    """A 1-d 'string' of masses (the classic plucked-string goo setup)."""
    pos = np.zeros((n_masses, 1), dtype=np.float32)
    pos[:, 0] = np.linspace(0, 1, n_masses)
    springs = np.stack(
        [np.arange(n_masses - 1), np.arange(1, n_masses)], axis=1
    ).astype(np.int32)
    rest = np.full((n_masses - 1,), 1.0 / (n_masses - 1), dtype=np.float32)
    stiff = np.full((n_masses - 1,), stiffness, dtype=np.float32)
    damp = np.full((n_masses,), damping, dtype=np.float32)
    fixed = np.zeros((n_masses,), dtype=np.float32)
    if fixed_ends:
        fixed[0] = fixed[-1] = 1.0
    return SpringMesh(
        jnp.asarray(pos),
        jnp.asarray(springs),
        jnp.asarray(rest),
        jnp.asarray(stiff),
        jnp.asarray(damp),
        jnp.asarray(fixed),
    )


def simulate(
    mesh: SpringMesh,
    forces: jax.Array,          # (n_steps, n_masses) transverse forcing
    pickup: int = 1,
    dt: float = 1.0 / 22050.0,
) -> jax.Array:
    """Roll the simulation out; returns the pickup mass's transverse
    displacement (n_steps,). Everything is one ``lax.scan``."""
    n_masses = mesh.positions.shape[0]
    i, j = mesh.springs[:, 0], mesh.springs[:, 1]
    movable = 1.0 - mesh.fixed

    def step(carry, force):
        disp, vel = carry  # transverse displacement + velocity (n_masses,)
        stretch_i = disp[i]
        stretch_j = disp[j]
        # linearized transverse spring force
        f_spring = mesh.stiffness * (stretch_j - stretch_i)
        accel = jnp.zeros(n_masses)
        accel = accel.at[i].add(f_spring)
        accel = accel.at[j].add(-f_spring)
        accel = accel + force
        vel = (vel + accel * dt * 1000.0) * mesh.damping * movable
        disp = disp + vel * dt * 1000.0
        disp = disp * movable
        return (disp, vel), disp[pickup]

    init = (jnp.zeros(n_masses), jnp.zeros(n_masses))
    _, out = lax.scan(step, init, forces)
    return out


def pluck_forces(
    n_steps: int, n_masses: int, position: int, width: int = 3,
    amplitude: float = 1.0, attack: int = 16,
) -> jnp.ndarray:
    """An impulsive 'pluck' forcing pattern."""
    forces = np.zeros((n_steps, n_masses), dtype=np.float32)
    lo = max(0, position - width)
    hi = min(n_masses, position + width + 1)
    env = np.hanning(attack * 2)[:attack]
    forces[:attack, lo:hi] = amplitude * env[:, None]
    return jnp.asarray(forces)
