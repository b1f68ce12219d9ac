from . import cameras  # noqa: F401
