"""Event-generator contract (reference
``modules/eventgenerators/generator.py:6-12``).

A generator declares its latent heads via ``shape_spec: {name: shape}``;
``mptpu.nn.MultiHeadTransform`` materializes one MLP head per entry and the
generator's ``forward`` consumes the resulting dict of arrays.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, Tuple

ShapeSpec = Dict[str, Tuple[int, ...]]


class EventGenerator(ABC):
    @property
    @abstractmethod
    def shape_spec(self) -> ShapeSpec:
        ...
