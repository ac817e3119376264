from . import intersect_pallas  # noqa: F401
