from .timing import print_timings, hhmmss  # noqa: F401
