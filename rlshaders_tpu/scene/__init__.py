from . import b85  # noqa: F401
