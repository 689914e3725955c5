"""Least-squares GAN losses (reference ``loss/least_squares.py:5-18``)."""

from __future__ import annotations

import jax.numpy as jnp

REAL_TARGET = 1.0
FAKE_TARGET = 0.0


def least_squares_generator_loss(j, real_target: float = REAL_TARGET):
    return 0.5 * jnp.mean((j - real_target) ** 2)


def squared_gan_loss(value, target):
    return jnp.mean((value - target) ** 2)


def least_squares_disc_loss(
    r_j, f_j, real_target: float = REAL_TARGET, fake_target: float = FAKE_TARGET
):
    return 0.5 * (
        jnp.mean((r_j - real_target) ** 2) + jnp.mean((f_j - fake_target) ** 2)
    )
