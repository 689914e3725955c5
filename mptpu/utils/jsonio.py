"""Strict-JSON metric dumping.

Python's ``json.dump`` emits ``Infinity``/``-Infinity``/``NaN`` by
default (``allow_nan=True``), which RFC 8259 forbids — ``jq``,
``JSON.parse`` and most strict parsers reject such files.  Run metrics
legitimately contain non-finite floats (e.g. a best-SNR that stayed at
``-inf`` because a run produced zero evals — ADVICE r4,
``siam_overfit_full_sw5b/metrics.json``), so every metrics writer in the
repo routes through :func:`dump_json`, which maps non-finite numbers to
``None``/``null`` first.
"""

from __future__ import annotations

import json
import math
from typing import Any, IO


def sanitize(obj: Any) -> Any:
    """Recursively replace non-finite floats with ``None``."""
    if isinstance(obj, float):
        return obj if math.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize(v) for v in obj]
    return obj


def dump_json(obj: Any, fp: IO[str], **kwargs: Any) -> None:
    """``json.dump`` that always produces RFC 8259-valid output."""
    json.dump(sanitize(obj), fp, allow_nan=False, **kwargs)


def dumps_json(obj: Any, **kwargs: Any) -> str:
    return json.dumps(sanitize(obj), allow_nan=False, **kwargs)
