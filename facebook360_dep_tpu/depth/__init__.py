from . import pipeline, solver  # noqa: F401
