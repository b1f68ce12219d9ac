from . import map_store  # noqa: F401
