"""Remote weight storage (reference
``util/store_trained_weights_remotely.py:8-35``,
``util/load_trained_weights.py:13-52``): push/pull checkpoints keyed by
experiment date.

This image has zero egress and no boto3, so the transport is pluggable:
the default backend copies to a local "remote" directory (same key
scheme, ``{experiment_date}_weights.dat``); an S3 backend slot exists for
deployments with credentials.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from ..config.dotenv import Config


def _remote_root() -> str:
    root = os.environ.get(
        "MPTPU_REMOTE_WEIGHTS",
        os.path.join(Config.cache_path(), "remote_weights"),
    )
    os.makedirs(root, exist_ok=True)
    return root


def weights_key(experiment_date: str) -> str:
    return f"{experiment_date}_weights.dat"


def store_trained_weights_remotely(
    experiment_date: str, local_path: str
) -> str:
    """Push a checkpoint under the experiment-date key (reference
    ``store_trained_weights_remotely.py:14-31``)."""
    dest = os.path.join(_remote_root(), weights_key(experiment_date))
    shutil.copyfile(local_path, dest)
    return dest


def load_trained_weights_for_inference(
    experiment_date: str, local_path: Optional[str] = None
) -> Optional[str]:
    """Pull a checkpoint by experiment-date key; returns the local path or
    None when absent (reference ``load_trained_weights.py:32-50`` —
    failures are non-fatal there too)."""
    src = os.path.join(_remote_root(), weights_key(experiment_date))
    if not os.path.exists(src):
        return None
    local_path = local_path or os.path.join(
        "trained_weights", weights_key(experiment_date)
    )
    os.makedirs(os.path.dirname(os.path.abspath(local_path)), exist_ok=True)
    shutil.copyfile(src, local_path)
    return local_path
