"""One-line description of this experiment (required — the
runner refuses experiments without a docstring, like the reference's
``current.py:181-182``)."""

import jax
import jax.numpy as jnp
import optax

from mptpu.data import AudioIterator
from mptpu.losses import iterative_loss
from mptpu.models import OverfitHierarchicalEvents, splat_loss_transform


class Experiment:
    """Replace with a meaningful experiment description."""

    n_samples = 2 ** 15
    batch_size = 1

    def run(self, max_iterations: int = 100):
        model = OverfitHierarchicalEvents(
            n_samples=self.n_samples, samplerate=22050,
            n_events=16, context_dim=16,
        )
        key = jax.random.PRNGKey(0)
        params = model.init(key, key)
        stream = iter(AudioIterator(
            self.batch_size, self.n_samples, normalize=True, overfit=True))
        target = next(stream)

        def loss_fn(p, k):
            recon, _, _ = model.apply(p, k)
            return iterative_loss(target, recon, splat_loss_transform)

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s, k):
            l, g = jax.value_and_grad(loss_fn)(p, k)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        for i in range(max_iterations):
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(key, i))
            if i % 10 == 0:
                print(f"iter {i} loss {float(loss):.4f}")
        return params


Current = Experiment
