"""L6 training harness (reference ``train/``, ``util/overfit.py``)."""

from .optim import optimizer, make_train_step, trust_ratio_clip
from .overfit import overfit_model
from .checkpoint import save_checkpoint, load_checkpoint, CheckpointManager
from .runner import BaseExperimentRunner
from .gan import gan_cycle, make_gan_steps

__all__ = [
    "optimizer",
    "make_train_step",
    "trust_ratio_clip",
    "overfit_model",
    "save_checkpoint",
    "load_checkpoint",
    "CheckpointManager",
    "BaseExperimentRunner",
    "gan_cycle",
    "make_gan_steps",
]
