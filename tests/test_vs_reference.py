"""End-to-end kernel parity vs the PyTorch reference (the north-star
correctness gate: elementwise agreement within 1e-5 of value scale)."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from tests.conftest import ref_forward

ATOL = 1e-5   # vs unit-scale kernels; checked against |K|_max below
RTOL = 1e-4


def pair(ref_kernels, spec):
    """Build (reference, ours) models from a shared spec string."""
    R = ref_kernels
    builders = {
        "conv7": (lambda M: M.Sequential(M.Conv2d(7),
                                         M.Conv2d(10, padding=0))),
        "conv_even": (lambda M: M.Sequential(M.Conv2d(4), M.ReLU(),
                                             M.Conv2d(2, stride=2),
                                             M.Conv2d(5, padding=0))),
        "conv_relu": (lambda M: M.Sequential(
            M.Conv2d(3, var_weight=2.79 * 9, var_bias=7.86), M.ReLU(),
            M.Conv2d(3, var_weight=2.79 * 9, var_bias=7.86), M.ReLU(),
            M.Conv2d(10, padding=0, var_weight=2.79, var_bias=7.86))),
        "strided": (lambda M: M.Sequential(M.Conv2d(3), M.ReLU(),
                                           M.Conv2d(3, stride=2), M.ReLU(),
                                           M.Conv2d(5, padding=0))),
        "dilated": (lambda M: M.Sequential(M.Conv2d(3, dilation=2), M.ReLU(),
                                           M.Conv2d(10, padding=0))),
        "residual": (lambda M: M.Sequential(
            M.Sum([M.Sequential(),
                   M.Sequential(M.Conv2d(4, var_weight=7.27 * 16,
                                         var_bias=4.69), M.ReLU())]),
            M.Conv2d(10, padding=0, var_weight=7.27, var_bias=4.69))),
        "resnet": (lambda M: M.Sequential(
            M.Conv2d(3),
            M.resnet_block(stride=1, projection_shortcut=True, multiplier=1),
            M.resnet_block(stride=2, projection_shortcut=True, multiplier=2),
            M.resnet_block(stride=1, projection_shortcut=False,
                           multiplier=2),
            M.Conv2d(5, padding=0), M.ReLU(), M.Conv2d(1, padding=0))),
    }
    return builders[spec](R), builders[spec](G)


SPECS = ["conv7", "conv_even", "conv_relu", "strided", "dilated", "residual",
         "resnet"]


def check(ref_np, ours, scale_floor=1e-3):
    ours = np.asarray(ours)
    assert ref_np.shape == ours.shape
    scale = max(np.abs(ref_np).max(), scale_floor)
    err = np.abs(ref_np - ours).max() / scale
    assert err < 1e-5, f"scaled err {err:.3e}"


@pytest.mark.parametrize("spec", SPECS)
def test_cross_block(ref_kernels, spec, rng):
    ref_m, our_m = pair(ref_kernels, spec)
    x = rng.randn(5, 3, 10, 10).astype(np.float32)
    y = rng.randn(7, 3, 10, 10).astype(np.float32)
    check(ref_forward(ref_m, x, y, same=False), our_m(x, y, same=False))


@pytest.mark.parametrize("spec", SPECS)
def test_same_block(ref_kernels, spec, rng):
    ref_m, our_m = pair(ref_kernels, spec)
    x = rng.randn(6, 3, 10, 10).astype(np.float32)
    check(ref_forward(ref_m, x), our_m(x))


@pytest.mark.parametrize("spec", ["conv_relu", "resnet"])
def test_diag(ref_kernels, spec, rng):
    ref_m, our_m = pair(ref_kernels, spec)
    x = rng.randn(6, 3, 10, 10).astype(np.float32)
    check(ref_forward(ref_m, x, diag=True), our_m(x, diag=True))


@pytest.mark.parametrize("spec", ["conv_relu"])
def test_cross_diag(ref_kernels, spec, rng):
    ref_m, our_m = pair(ref_kernels, spec)
    x = rng.randn(6, 3, 10, 10).astype(np.float32)
    y = rng.randn(6, 3, 10, 10).astype(np.float32)
    check(ref_forward(ref_m, x, y, same=False, diag=True),
          our_m(x, y, same=False, diag=True))


def test_mixture(ref_kernels, rng):
    import torch
    R = ref_kernels
    logits = np.array([0.3, -0.7], np.float32)
    ref_m = R.Sequential(
        R.Mixture([R.Conv2d(3), R.Sequential(R.Conv2d(3), R.ReLU())],
                  torch.from_numpy(logits.copy())),
        R.Conv2d(10, padding=0))
    our_m = G.Sequential(
        G.Mixture([G.Conv2d(3), G.Sequential(G.Conv2d(3), G.ReLU())],
                  logits),
        G.Conv2d(10, padding=0))
    x = rng.randn(4, 3, 10, 10).astype(np.float32)
    y = rng.randn(5, 3, 10, 10).astype(np.float32)
    check(ref_forward(ref_m, x, y, same=False), our_m(x, y, same=False))


def test_mnist_shape_model(ref_kernels, rng):
    """7-layer ConvNet GP on full 28x28 MNIST-shaped inputs (the paper's
    configuration, reference: configs/mnist_paper_convnet_gp.py)."""
    R = ref_kernels
    var_bias, var_weight = 7.86, 2.79

    def build(M):
        layers = []
        for _ in range(7):
            layers += [M.Conv2d(kernel_size=7, padding="same",
                                var_weight=var_weight * 7 ** 2,
                                var_bias=var_bias), M.ReLU()]
        return M.Sequential(*layers,
                            M.Conv2d(kernel_size=28, padding=0,
                                     var_weight=var_weight,
                                     var_bias=var_bias))

    ref_m, our_m = build(R), build(G)
    x = rng.rand(3, 1, 28, 28).astype(np.float32)
    y = rng.rand(4, 1, 28, 28).astype(np.float32)
    check(ref_forward(ref_m, x, y, same=False), our_m(x, y, same=False))
    check(ref_forward(ref_m, x), our_m(x))


def test_layers_counts():
    m = G.Sequential(G.Conv2d(3), G.ReLU(),
                     G.resnet_block(stride=2, projection_shortcut=True,
                                    multiplier=2))
    # conv + (within block: max(branch conv counts) = 2) ... Sum.layers is
    # max over branches (reference: cnn_gp/kernels.py:259-260)
    assert m.layers() == 3
    assert G.ReLU().layers() == 0
    assert G.Conv2d(5).layers() == 1
