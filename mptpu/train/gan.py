"""GAN training alternation (reference ``train/gan.py:5-35``)."""

from __future__ import annotations

from itertools import cycle
from typing import Callable

import jax
import optax

from ..losses.gan import least_squares_generator_loss, least_squares_disc_loss


def gan_cycle():
    """Infinite 'gen'/'disc' alternation (reference ``gan.py:5``)."""
    return cycle(["gen", "disc"])


def make_gan_steps(
    gen_apply: Callable,
    disc_apply: Callable,
    gen_opt: optax.GradientTransformation,
    disc_opt: optax.GradientTransformation,
):
    """Jitted train_gen / train_disc steps (reference ``gan.py:13-35``)."""

    @jax.jit
    def train_gen(gen_params, gen_opt_state, disc_params, batch, key):
        def loss_fn(gp):
            fake = gen_apply(gp, batch, key)
            j = disc_apply(disc_params, fake)
            return least_squares_generator_loss(j)

        loss, grads = jax.value_and_grad(loss_fn)(gen_params)
        updates, new_state = gen_opt.update(grads, gen_opt_state, gen_params)
        return optax.apply_updates(gen_params, updates), new_state, loss

    @jax.jit
    def train_disc(disc_params, disc_opt_state, gen_params, batch, key):
        def loss_fn(dp):
            fake = gen_apply(gen_params, batch, key)
            fj = disc_apply(dp, fake)
            rj = disc_apply(dp, batch)
            return least_squares_disc_loss(rj, fj)

        loss, grads = jax.value_and_grad(loss_fn)(disc_params)
        updates, new_state = disc_opt.update(grads, disc_opt_state, disc_params)
        return optax.apply_updates(disc_params, updates), new_state, loss

    return train_gen, train_disc
