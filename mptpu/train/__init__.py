"""L6 training harness (reference ``train/``, ``util/overfit.py``)."""

from .optim import optimizer, make_train_step
from .overfit import overfit_model
from .checkpoint import save_checkpoint, load_checkpoint, CheckpointManager
from .runner import BaseExperimentRunner
from .gan import gan_cycle, make_gan_steps

__all__ = [
    "optimizer",
    "make_train_step",
    "overfit_model",
    "save_checkpoint",
    "load_checkpoint",
    "CheckpointManager",
    "BaseExperimentRunner",
    "gan_cycle",
    "make_gan_steps",
]
