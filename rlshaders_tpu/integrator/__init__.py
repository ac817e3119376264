from . import camera, lights  # noqa: F401
