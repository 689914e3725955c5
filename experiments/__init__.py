from .e_2026_8_16 import Current  # noqa
