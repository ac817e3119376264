from . import vecmath, frame, rng  # noqa: F401
