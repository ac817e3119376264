from . import ggx, disney, orennayar, sss_profiles  # noqa: F401
