"""Tile scheduler tests: exact coverage/partition of the (i, j) triangle
for arbitrary worker counts."""

import numpy as np
import pytest

from cnn_gp_tpu.parallel import scheduler


def test_manifest_matches_reference_order():
    """Our static manifest must enumerate tiles in the reference generator's
    order (reference: cnn_gp/data.py:22-29; that module imports torchvision,
    so the expected order is rebuilt from its documented semantics)."""
    for n in (1, 2, 5):
        got = scheduler.tile_manifest(n, n, True)
        want = []
        for i in range(n):
            want.append((1, i, i))
            for j in range(i + 1, n):
                want.append((0, i, j))
        np.testing.assert_array_equal(got, np.asarray(want).reshape(-1, 3))


def test_manifest_cross():
    got = scheduler.tile_manifest(2, 3, False)
    want = [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 1, 0), (0, 1, 1), (0, 1, 2)]
    np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.parametrize("total,n_workers", [(10, 3), (7, 7), (31, 4),
                                             (5, 8), (1, 1), (100, 16)])
def test_worker_span_partition(total, n_workers):
    """Spans must exactly tile [0, total) with remainder to low ranks
    (reference: cnn_gp/data.py:11-19)."""
    spans = [scheduler.worker_span(total, r, n_workers)
             for r in range(n_workers)]
    covered = []
    for start, count in spans:
        covered.extend(range(start, start + count))
    assert covered == list(range(total))
    counts = [c for _, c in spans]
    assert max(counts) - min(counts) <= 1
    assert counts == sorted(counts, reverse=True)


@pytest.mark.parametrize("order", ["contiguous", "strided"])
@pytest.mark.parametrize("n_workers", [1, 2, 5])
def test_worker_manifest_covers_all(order, n_workers):
    full = scheduler.tile_manifest(7, 7, True)
    parts = [scheduler.worker_manifest(70, 70, 10, True, r, n_workers,
                                       order=order)
             for r in range(n_workers)]
    got = np.concatenate(parts)
    assert len(got) == len(full)
    got_set = {tuple(r) for r in got.tolist()}
    want_set = {tuple(r) for r in full.tolist()}
    assert got_set == want_set


def test_n_tiles():
    assert scheduler.n_tiles(5, 5, True) == 15
    assert scheduler.n_tiles(3, 4, False) == 12
    assert scheduler.n_tiles(0, 0, True) == 1  # reference max(1, ...)
