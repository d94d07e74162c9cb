from .timing import print_timings, hhmmss  # noqa: F401


def round_up_div(a: int, b: int) -> int:
    return (a + b - 1) // b
