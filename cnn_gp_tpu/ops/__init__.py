from . import arccos, boxfilter  # noqa: F401
