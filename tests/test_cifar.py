"""CIFAR-10 path tests: pickle-batch loading through the real config."""

import os

import numpy as np
import pytest

import configs
from cnn_gp_tpu.data import datasets
from scripts.make_fake_dataset import make_cifar10


@pytest.fixture(scope="module")
def fake_cifar(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cifar"))
    make_cifar10(root)  # writes {root}/CIFAR10/cifar-10-batches-py
    return root


def test_cifar_loader_shapes(fake_cifar):
    tr_x, tr_y, te_x, te_y = datasets.load_cifar10_arrays(
        os.path.join(fake_cifar, "CIFAR10"))
    assert tr_x.shape == (50000, 3, 32, 32)
    assert te_x.shape == (10000, 3, 32, 32)
    assert tr_x.dtype == np.float32 and tr_x.max() <= 1.0
    assert set(np.unique(tr_y)) <= set(range(10))


def test_cifar_config_splits(fake_cifar):
    cfg = configs.load("cifar10")
    ds = datasets.DatasetFromConfig(fake_cifar, cfg)
    assert len(ds.train) == 40000
    assert len(ds.validation) == 10000
    assert len(ds.test) == 10000


def test_cifar_model_kernel_block(fake_cifar):
    """One tiny Gram block through the full CIFAR ResNet-32 kernel."""
    cfg = configs.load("cifar10")
    ds = datasets.DatasetFromConfig(fake_cifar, cfg)
    x = ds.train.images[:2]
    k = np.asarray(cfg.initial_model(x))
    assert k.shape == (2, 2)
    assert np.isfinite(k).all()
    assert k[0, 1] == k[1, 0]
