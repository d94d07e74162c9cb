"""Config zoo tests: attribute contract + numerical parity of each shipped
architecture against the reference's kernels."""

import numpy as np
import pytest

import configs
from tests.conftest import ref_forward

ALL_CONFIGS = ["mnist", "mnist_as_tf", "mnist_paper_convnet_gp",
               "mnist_paper_residual_cnn_gp", "cifar10", "synthetic"]


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_attribute_contract(name):
    cfg = configs.load(name)
    for attr in ["dataset_name", "train_range", "validation_range",
                 "test_range", "in_channels", "transforms", "initial_model"]:
        assert hasattr(cfg, attr), f"{name} missing {attr}"
    assert cfg.initial_model.layers() >= 1


def test_split_sizes_match_reference():
    c = configs.load("mnist_as_tf")
    assert list(c.train_range) == list(range(5000, 55000))
    assert list(c.validation_range) == (list(range(55000, 60000))
                                        + list(range(0, 5000)))
    assert list(c.test_range) == list(range(60000, 70000))
    c = configs.load("cifar10")
    assert len(list(c.train_range)) == 40000
    assert c.kernel_batch_size == 350


def test_resnet32_layer_count():
    # stem + 15 blocks (2-3 convs counted as max per Sum) + 2-3 readout convs
    m = configs.load("mnist_as_tf").initial_model
    assert m.layers() == 1 + 15 * 2 + 2


def _ref_resnet32(R, readout):
    trunk = [R.Conv2d(kernel_size=3)]
    for mult, first in [(1, True), (2, False), (4, False)]:
        stride = 1 if first else 2
        trunk.append(R.resnet_block(stride=stride, projection_shortcut=True,
                                    multiplier=mult))
        for _ in range(4):
            trunk.append(R.resnet_block(stride=1, projection_shortcut=False,
                                        multiplier=mult))
    return R.Sequential(*trunk, *readout)


@pytest.mark.slow
def test_mnist_as_tf_parity(ref_kernels, rng):
    """Full ResNet-32 MNIST architecture vs reference on real-shape data."""
    R = ref_kernels
    ref_m = _ref_resnet32(R, [
        R.Conv2d(kernel_size=7, padding=0, in_channel_multiplier=4,
                 out_channel_multiplier=4),
        R.ReLU(),
        R.Conv2d(kernel_size=1, padding=0, in_channel_multiplier=4)])
    our_m = configs.load("mnist_as_tf").initial_model
    x = rng.rand(3, 1, 28, 28).astype(np.float32)
    y = rng.rand(2, 1, 28, 28).astype(np.float32)
    want = ref_forward(ref_m, x, y, same=False)
    got = np.asarray(our_m(x, y, same=False))
    scale = np.abs(want).max()
    assert np.abs(want - got).max() / scale < 1e-5


@pytest.mark.slow
def test_cifar10_parity(ref_kernels, rng):
    R = ref_kernels
    ref_m = _ref_resnet32(R, [
        R.Conv2d(kernel_size=8, padding=0, in_channel_multiplier=4,
                 out_channel_multiplier=4),
        R.Conv2d(kernel_size=1, padding=0, in_channel_multiplier=4,
                 out_channel_multiplier=4),
        R.ReLU(),
        R.Conv2d(kernel_size=1, padding=0, in_channel_multiplier=4)])
    our_m = configs.load("cifar10").initial_model
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    want = ref_forward(ref_m, x)
    got = np.asarray(our_m(x))
    scale = np.abs(want).max()
    assert np.abs(want - got).max() / scale < 1e-5


def test_paper_convnet_parity(ref_kernels, rng):
    R = ref_kernels
    var_bias, var_weight = 7.86, 2.79
    layers = []
    for _ in range(7):
        layers += [R.Conv2d(kernel_size=7, padding="same",
                            var_weight=var_weight * 49, var_bias=var_bias),
                   R.ReLU()]
    ref_m = R.Sequential(*layers, R.Conv2d(kernel_size=28, padding=0,
                                           var_weight=var_weight,
                                           var_bias=var_bias))
    our_m = configs.load("mnist_paper_convnet_gp").initial_model
    x = rng.rand(3, 1, 28, 28).astype(np.float32)
    want = ref_forward(ref_m, x)
    got = np.asarray(our_m(x))
    assert np.abs(want - got).max() / np.abs(want).max() < 1e-5


def test_paper_residual_parity(ref_kernels, rng):
    R = ref_kernels
    var_bias, var_weight = 4.69, 7.27
    ref_m = R.Sequential(
        *(R.Sum([R.Sequential(),
                 R.Sequential(R.Conv2d(kernel_size=4, padding="same",
                                       var_weight=var_weight * 16,
                                       var_bias=var_bias), R.ReLU())])
          for _ in range(8)),
        R.Conv2d(kernel_size=4, padding="same", var_weight=var_weight * 16,
                 var_bias=var_bias),
        R.ReLU(),
        R.Conv2d(kernel_size=28, padding=0, var_weight=var_weight,
                 var_bias=var_bias))
    our_m = configs.load("mnist_paper_residual_cnn_gp").initial_model
    x = rng.rand(3, 1, 28, 28).astype(np.float32)
    want = ref_forward(ref_m, x)
    got = np.asarray(our_m(x))
    assert np.abs(want - got).max() / np.abs(want).max() < 1e-5
