from . import fusion, mesh, native  # noqa: F401
