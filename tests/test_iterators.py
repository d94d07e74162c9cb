"""Iterator-compat API tests: reference-order yields, coverage, shapes,
and reference-style ``(i, (x, y))`` unpacking."""

import numpy as np

from cnn_gp_tpu.data import ArrayDataset, DiagIterator, ProductIterator


def test_product_iterator_symmetric_order():
    x = np.arange(25 * 4, dtype=np.float32).reshape(25, 1, 2, 2)
    items = list(ProductIterator(10, x))
    # 3 row batches => 6 upper-triangle blocks in reference order
    coords = [(i // 10, j // 10)
              for _, (i, _), (j, _) in items]
    assert coords == [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    same_flags = [s for s, _, _ in items]
    assert same_flags == [True, False, False, True, False, True]
    # reference-style unpacking: batches are (images, labels) pairs
    same, (i, (xb, yb)), (j, (zb, wb)) = items[-1]
    assert xb.shape[0] == 5 and yb is None  # ragged last batch


def test_product_iterator_dataset_labels():
    ds = ArrayDataset(np.zeros((20, 1, 2, 2), np.float32),
                      np.arange(20, dtype=np.int64))
    for same, (i, (xb, yb)), (j, (zb, wb)) in ProductIterator(10, ds):
        np.testing.assert_array_equal(yb, np.arange(i, i + len(xb)))
        np.testing.assert_array_equal(wb, np.arange(j, j + len(zb)))


def test_product_iterator_worker_split():
    x = np.zeros((40, 1, 2, 2), np.float32)
    all_coords = set()
    total = 0
    for rank in range(3):
        it = ProductIterator(10, x, worker_rank=rank, n_workers=3)
        for _, (i, _), (j, _) in it:
            all_coords.add((i, j))
            total += 1
    assert total == 10  # 4 batches => 10 upper-tri blocks
    assert len(all_coords) == 10


def test_product_iterator_cross():
    x = np.zeros((20, 1, 2, 2), np.float32)
    z = np.ones((30, 1, 2, 2), np.float32)
    items = list(ProductIterator(10, x, z))
    assert len(items) == 6
    assert all(not s for s, _, _ in items)
    assert items[0][2][1][0][0, 0, 0, 0] == 1.0


def test_diag_iterator():
    x = np.zeros((25, 1, 2, 2), np.float32)
    items = list(DiagIterator(10, x))
    assert len(items) == 3
    s, (i0, (xb, yb)), (j0, (zb, wb)) = items[-1]
    assert s and i0 == 20 and xb.shape[0] == 5
