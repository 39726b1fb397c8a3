from . import camera, imagetypes, io  # noqa: F401
