"""Failure-detection tests: non-finite Gram tiles must fail fast."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.parallel import compute_gram, gram
from cnn_gp_tpu.parallel.multihost import worker_identity


def test_check_block_finite_raises():
    block = np.ones((4, 4), np.float32)
    gram.check_block_finite(block, 0, 0)  # fine
    block[2, 3] = np.inf
    with pytest.raises(FloatingPointError) as e:
        gram.check_block_finite(block, 8, 12)
    assert "(10, 15)" in str(e.value)


def test_overflowing_model_fails_fast():
    """A kernel whose variances overflow float32 must raise, not write
    garbage (the reference drops into ipdb here,
    cnn_gp/kernel_save_tools.py:51-53)."""
    model = G.Sequential(
        *[G.Conv2d(3, var_weight=1e12) for _ in range(4)],
        G.Conv2d(8, padding=0, var_weight=1e12))
    x = np.random.RandomState(0).rand(8, 1, 8, 8).astype(np.float32)
    with pytest.raises(FloatingPointError, match="non-finite"):
        compute_gram(model, x, batch_size=8, progress=False)


def test_worker_identity_single_process():
    assert worker_identity() == (0, 1)
