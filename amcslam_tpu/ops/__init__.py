from . import lie, gp  # noqa: F401
