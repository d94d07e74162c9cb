"""Profiling/tracing utilities.

The reference's only observability is wall-clock progress lines
(reference: cnn_gp/data.py:174-196; kept as utils/timing.py).  On TPU the
native tool is the XLA profiler: ``capture(...)`` wraps a region in a
``jax.profiler`` trace whose output loads in TensorBoard/XProf, and
``annotate(name)`` marks host-side spans (e.g. one Gram tile) so device
steps can be attributed to tiles.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["capture", "annotate"]


@contextlib.contextmanager
def capture(log_dir: str):
    """Capture an XLA profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host span visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)
