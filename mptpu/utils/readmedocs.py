"""Experiment docstring from its readme.md (reference
``util/readmedocs.py:4-10``)."""

from __future__ import annotations

import os


def readme(path: str):
    """Class decorator: set __doc__ from the readme.md next to ``path``
    (pass ``__file__`` of the experiment module)."""

    def decorator(cls):
        readme_path = os.path.join(os.path.dirname(os.path.abspath(path)), "readme.md")
        try:
            with open(readme_path) as f:
                cls.__doc__ = f.read()
        except IOError:
            pass
        return cls

    return decorator
