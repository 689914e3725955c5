"""Dated-experiment CLI (reference ``current.py:52-192``): run the current
experiment, or scaffold a new dated experiment directory.

Usage:
  python scripts/experiment.py            # run experiments/current
  python scripts/experiment.py --new      # scaffold experiments/e_YYYY_M_D
  python scripts/experiment.py --list
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mptpu.utils.platform import apply_platform_from_env
apply_platform_from_env()

EXPERIMENTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"
)

_TEMPLATE = '''"""One-line description of this experiment (required — the
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
'''


def new_experiment() -> str:
    now = datetime.now()
    name = f"e_{now.year}_{now.month}_{now.day}"
    path = os.path.join(EXPERIMENTS_DIR, name)
    if os.path.exists(path):
        raise FileExistsError(f"{path} already exists")
    os.makedirs(path)
    with open(os.path.join(path, "__init__.py"), "w") as f:
        f.write(f"from .experiment import Current  # noqa\n")
    with open(os.path.join(path, "experiment.py"), "w") as f:
        f.write(_TEMPLATE)
    with open(os.path.join(path, "readme.md"), "w") as f:
        f.write(f"# {name}\n\nDescribe this experiment.\n")
    # point experiments/__init__.py at the new experiment
    with open(os.path.join(EXPERIMENTS_DIR, "__init__.py"), "w") as f:
        f.write(f"from .{name} import Current  # noqa\n")
    return path


def list_experiments():
    if not os.path.isdir(EXPERIMENTS_DIR):
        return []
    return sorted(
        d for d in os.listdir(EXPERIMENTS_DIR)
        if d.startswith("e_") and os.path.isdir(os.path.join(EXPERIMENTS_DIR, d))
    )


def run_current(max_iterations: int | None):
    sys.path.insert(0, os.path.dirname(EXPERIMENTS_DIR))
    mod = importlib.import_module("experiments")
    Current = mod.Current
    if not (Current.__doc__ or "").strip():
        raise ValueError(
            "Experiment must have a docstring describing it "
            "(reference current.py:181-182)"
        )
    exp = Current()
    kwargs = {}
    if max_iterations is not None:
        kwargs["max_iterations"] = max_iterations
    return exp.run(**kwargs)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--new", action="store_true")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--iterations", type=int, default=None)
    args = parser.parse_args()
    if args.new:
        print(f"scaffolded {new_experiment()}")
    elif args.list:
        print("\n".join(list_experiments()))
    else:
        run_current(args.iterations)
