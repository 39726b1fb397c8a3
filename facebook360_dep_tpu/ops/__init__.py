from . import cost, filters, sampling  # noqa: F401
