from . import bvh  # noqa: F401
