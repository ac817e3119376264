from . import sample_writer  # noqa: F401
