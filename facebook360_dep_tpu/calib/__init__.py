from . import ba, calibration  # noqa: F401
