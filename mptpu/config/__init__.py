"""L7 config layer (reference ``config/dotenv.py``, ``config/experiment.py``)."""

from .dotenv import Config, parse_dotenv
from .experiment import Experiment

__all__ = ["Config", "parse_dotenv", "Experiment"]
