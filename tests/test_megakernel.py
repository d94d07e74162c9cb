"""Whole-network fused Pallas megakernel: pattern matching + numerical
parity with the XLA path (interpret mode on CPU; the on-TPU perf verdict
lives in BASELINE.md via scripts/megakernel_bench.py)."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.kernels import apply_kernel
from cnn_gp_tpu.ops import megakernel


@pytest.fixture(scope="module")
def convnet_model():
    import configs
    return configs.load("mnist_paper_convnet_gp").initial_model


def test_match_convnet_gp(convnet_model):
    spec = megakernel.match(convnet_model)
    assert spec is not None
    assert spec.kernel_size == 7 and len(spec.layer_vw_vb) == 7
    assert spec.readout_k == 28
    assert spec.layer_vw_vb[0] == (2.79 * 49, 7.86)


def test_match_rejects_non_fusable():
    # residual topology
    assert megakernel.match(G.Sum([G.Sequential(), G.Sequential()])) is None
    # strided conv
    assert megakernel.match(G.Sequential(
        G.Conv2d(3, stride=2), G.ReLU(), G.Conv2d(7, padding=0))) is None
    # even kernel ("same" zeros trick)
    assert megakernel.match(G.Sequential(
        G.Conv2d(4), G.ReLU(), G.Conv2d(7, padding=0))) is None
    # readout with padding
    assert megakernel.match(G.Sequential(
        G.Conv2d(3), G.ReLU(), G.Conv2d(7))) is None


@pytest.mark.parametrize("use_mask", [False, True])
def test_parity_with_xla_path(convnet_model, use_mask):
    spec = megakernel.match(convnet_model)
    x, _, _, _ = synthetic_arrays(n_train=16, n_test=0, shape=(1, 28, 28))
    z, _, _, _ = synthetic_arrays(n_train=128, n_test=0, shape=(1, 28, 28),
                                  seed=5)
    mask = None
    if use_mask:
        mask = np.arange(16)[:, None] == np.arange(128)[None, :]
    want = np.asarray(apply_kernel(convnet_model, x, z, False, False, mask))
    got = np.asarray(megakernel.gram_tile(spec, x, z, mask, rows_per_step=8,
                                          interpret=True))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_multichannel_parity():
    """C=3 (CIFAR-shaped) channel-mean input moments."""
    model = G.Sequential(G.Conv2d(3, var_weight=2.0, var_bias=0.5), G.ReLU(),
                         G.Conv2d(3, var_weight=1.5, var_bias=0.1), G.ReLU(),
                         G.Conv2d(8, padding=0))
    spec = megakernel.match(model)
    assert spec is not None and spec.kernel_size == 3
    x, _, _, _ = synthetic_arrays(n_train=8, n_test=0, shape=(3, 8, 8))
    z, _, _, _ = synthetic_arrays(n_train=128, n_test=0, shape=(3, 8, 8),
                                  seed=2)
    want = np.asarray(apply_kernel(model, x, z, False, False, None))
    got = np.asarray(megakernel.gram_tile(spec, x, z, None, rows_per_step=8,
                                          interpret=True))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
