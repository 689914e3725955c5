from .experiment import Current  # noqa
