"""Gram-tile scheduling: static manifests replacing iterator-based sharding.

The reference enumerates (upper-triangle) block indices lazily and slices a
contiguous span per worker process (reference: cnn_gp/data.py:11-60).  On
TPU we want the whole schedule as **static arrays** up front: a manifest of
(i, j) tile coordinates that can be partitioned contiguously (exact
reference semantics, for shard-compatible resume) or round-robin (balanced
work for lockstep SPMD sweeps), padded, reshaped onto a device mesh, and
scanned -- no Python iterator state.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils import round_up_div

__all__ = ["n_tiles", "tile_manifest", "worker_span", "worker_manifest",
           "round_up_div"]


def n_tiles(n1_batches: int, n2_batches: int, symmetric: bool) -> int:
    if symmetric:
        return max(1, n1_batches * (n1_batches + 1) // 2)
    return n1_batches * n2_batches


def tile_manifest(n1_batches: int, n2_batches: int, symmetric: bool
                  ) -> np.ndarray:
    """[T, 3] int32 rows (is_diag, i, j) in the reference's enumeration
    order: for each row i, the diagonal tile first, then j > i (reference:
    cnn_gp/data.py:22-29).  Matching the order exactly keeps worker spans
    byte-compatible with reference shard files."""
    rows = []
    for i in range(n1_batches):
        if symmetric:
            rows.append((1, i, i))
            for j in range(i + 1, n2_batches):
                rows.append((0, i, j))
        else:
            for j in range(n2_batches):
                rows.append((0, i, j))
    return np.asarray(rows, dtype=np.int32).reshape(-1, 3)


def worker_span(total: int, worker_rank: int, n_workers: int
                ) -> Tuple[int, int]:
    """(start, count) of this worker's contiguous span; equal split with the
    remainder given to low ranks (reference: cnn_gp/data.py:11-19)."""
    per = np.full(n_workers, total // n_workers, dtype=np.int64)
    per[:total % n_workers] += 1
    start = int(per[:worker_rank].sum())
    return start, int(per[worker_rank])


def worker_manifest(n1: int, n2, batch_size: int, symmetric: bool,
                    worker_rank: int = 0, n_workers: int = 1,
                    order: str = "contiguous") -> np.ndarray:
    """This worker's [t, 3] slice of the tile manifest.

    order="contiguous" replicates the reference partition exactly;
    order="strided" deals tiles round-robin, which balances the mix of
    cheap edge tiles and is the natural layout for an SPMD sweep.
    """
    n1_b = round_up_div(n1, batch_size)
    n2_b = n1_b if symmetric else round_up_div(n2, batch_size)
    manifest = tile_manifest(n1_b, n2_b, symmetric)
    if order == "contiguous":
        start, count = worker_span(len(manifest), worker_rank, n_workers)
        return manifest[start:start + count]
    if order == "strided":
        return manifest[worker_rank::n_workers]
    raise ValueError(f"unknown order {order!r}")
