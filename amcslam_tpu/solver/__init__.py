from . import robust, lm  # noqa: F401
