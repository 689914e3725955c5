"""Experiment runner: stream -> train-step loop with monitored values,
loss time series, and periodic checkpointing (reference
``train/experiment_runner.py:44-185``)."""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from .checkpoint import CheckpointManager
from ..obs.collection import Collection


class BaseExperimentRunner:
    """Subclass-or-compose runner.

    ``train_step(params, opt_state, batch, key) -> (params, opt_state,
    loss, recon)`` drives the loop; ``self.real`` / ``self.fake``
    assignments auto-log to the collection like the reference's
    ``MonitoredValueDescriptor`` (``experiment_runner.py:44-61``).
    """

    def __init__(
        self,
        stream: Iterable,
        train_step: Callable,
        params,
        opt_state,
        checkpoint_dir: str = "trained_weights",
        checkpoint_every: int = 1000,
        collection: Optional[Collection] = None,
        seed: int = 0,
    ):
        self.stream = stream
        self.train_step = train_step
        self.params = params
        self.opt_state = opt_state
        self.ckpt = CheckpointManager(checkpoint_dir, every=checkpoint_every)
        self.collection = collection
        self.key = jax.random.PRNGKey(seed)
        self.losses: list[float] = []
        self.iteration = 0

    def _log(self, name: str, value):
        if self.collection is not None:
            self.collection.log(name, np.asarray(value))

    def __setattr__(self, name, value):
        # monitored-value behavior: assigning real/fake logs them
        if name in ("real", "fake") and getattr(self, "collection", None):
            self._log(name, value)
        object.__setattr__(self, name, value)

    def after_training_iteration(self, loss):
        self.losses.append(float(loss))
        self._log("loss", np.asarray(self.losses[-100:]))
        self.ckpt.maybe_save(self.iteration, self.params, self.opt_state)

    def resume(self) -> int:
        payload = self.ckpt.latest()
        if payload is not None:
            self.params = payload["params"]
            if payload["opt_state"] is not None:
                self.opt_state = payload["opt_state"]
            self.iteration = payload["step"]
        return self.iteration

    def run(self, max_iterations: Optional[int] = None):
        for item in self.stream:
            k = jax.random.fold_in(self.key, self.iteration)
            self.real = item
            self.params, self.opt_state, loss, recon = self.train_step(
                self.params, self.opt_state, item, k
            )
            self.fake = recon
            self.after_training_iteration(loss)
            self.iteration += 1
            if max_iterations is not None and self.iteration >= max_iterations:
                break
        return self.params
