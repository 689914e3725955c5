"""Flagship model assemblies (SURVEY.md §0 five workloads)."""

from .splat_overfit import OverfitHierarchicalEvents, splat_loss_transform
from .ssm_overfit import InstrumentModel, OverfitControlPlane
from .siam import SIAMModel

__all__ = [
    "OverfitHierarchicalEvents",
    "splat_loss_transform",
    "InstrumentModel",
    "OverfitControlPlane",
    "SIAMModel",
]
