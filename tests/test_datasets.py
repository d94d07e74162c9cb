"""Dataset loading tests: IDX parsing, concat-then-split semantics,
synthetic data."""

import gzip
import os
import struct

import numpy as np
import pytest

from cnn_gp_tpu.data import datasets


def _write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))
        f.write(struct.pack(">III", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", len(arr)))
        f.write(arr.astype(np.uint8).tobytes())


@pytest.fixture()
def fake_mnist(tmp_path):
    raw = tmp_path / "MNIST" / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    tr = rng.randint(0, 256, (20, 28, 28), np.uint8)
    te = rng.randint(0, 256, (10, 28, 28), np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", tr)
    _write_idx_labels(raw / "train-labels-idx1-ubyte",
                      np.arange(20) % 10)
    _write_idx_images(raw / "t10k-images-idx3-ubyte", te)
    _write_idx_labels(raw / "t10k-labels-idx1-ubyte", np.arange(10) % 10)
    return str(tmp_path), tr, te


def test_mnist_idx_roundtrip(fake_mnist):
    root, tr, te = fake_mnist
    tr_x, tr_y, te_x, te_y = datasets.load_mnist_arrays(
        os.path.join(root, "MNIST"))
    assert tr_x.shape == (20, 1, 28, 28) and te_x.shape == (10, 1, 28, 28)
    np.testing.assert_allclose(tr_x[:, 0] * 255.0, tr, atol=1e-5)
    np.testing.assert_array_equal(tr_y, np.arange(20) % 10)


def test_gzipped_idx(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (5, 4, 4), np.uint8)
    plain = tmp_path / "imgs"
    _write_idx_images(plain, arr)
    gz = tmp_path / "only.gz"
    with open(plain, "rb") as f, gzip.open(str(gz)[:-3] + ".gz", "wb") as g:
        g.write(f.read())
    got = datasets._read_idx(str(gz)[:-3])
    np.testing.assert_array_equal(got, arr)


def test_concat_then_split_semantics(fake_mnist):
    """test_range indexing past the train pool must reach test images
    (reference: cnn_gp/data.py:147-158)."""
    root, tr, te = fake_mnist

    class Cfg:
        dataset_name = "MNIST"
        train_range = range(0, 15)
        validation_range = range(15, 20)
        test_range = range(20, 30)   # past 20-image train set
        transforms = []
        in_channels = 1

    ds = datasets.DatasetFromConfig(root, Cfg)
    assert len(ds.train) == 15 and len(ds.validation) == 5
    assert len(ds.test) == 10
    np.testing.assert_allclose(ds.test.images[:, 0] * 255.0, te, atol=1e-5)


def test_synthetic_dataset_learnable():
    tr_x, tr_y, _, _ = datasets.synthetic_arrays(n_train=100)
    assert tr_x.shape == (100, 1, 28, 28)
    # same-class examples are closer than cross-class on average
    d_same, d_diff, n = 0.0, 0.0, 0
    for c in range(3):
        a = tr_x[tr_y == c][:3]
        b = tr_x[tr_y == (c + 1) % 10][:3]
        d_same += np.linalg.norm(a[0] - a[1])
        d_diff += np.linalg.norm(a[0] - b[0])
    assert d_same < d_diff


def test_transforms_applied(fake_mnist):
    root, _, _ = fake_mnist

    class Cfg:
        dataset_name = "MNIST"
        train_range = range(0, 10)
        validation_range = range(10, 15)
        test_range = range(15, 20)
        transforms = [lambda x: x * 2.0]
        in_channels = 1

    ds = datasets.DatasetFromConfig(root, Cfg)
    assert ds.train.images.max() > 1.0


def test_per_image_transform_fallback(fake_mnist):
    """Single-image transforms (the reference's torchvision contract,
    reference: cnn_gp/data.py:143-145) must work via per-image fallback."""
    root, _, _ = fake_mnist

    class Cfg:
        dataset_name = "MNIST"
        train_range = range(0, 10)
        validation_range = range(10, 15)
        test_range = range(15, 20)
        # rejects batched input: only accepts a single [C, W, H] image
        transforms = [lambda img: (_ for _ in ()).throw(ValueError)
                      if img.ndim == 4 else img + 1.0]
        in_channels = 1

    ds = datasets.DatasetFromConfig(root, Cfg)
    assert ds.train.images.min() >= 1.0


def test_axis_flipping_transform_keeps_image_order(fake_mnist):
    """A per-image transform that happens to preserve the batch shape when
    misapplied to the pool (img[::-1] reverses image ORDER batched, but
    flips the channel/row axis per image) must be applied per image: the
    image<->label pairing may never change."""
    root, _, _ = fake_mnist

    class Plain:
        dataset_name = "MNIST"
        train_range = range(0, 20)
        validation_range = range(20, 25)
        test_range = range(25, 30)
        transforms = []
        in_channels = 1

    class Flipped(Plain):
        transforms = [lambda img: img[:, ::-1]]   # vertical flip per image

    plain = datasets.DatasetFromConfig(root, Plain)
    flip = datasets.DatasetFromConfig(root, Flipped)
    np.testing.assert_array_equal(plain.train.labels, flip.train.labels)
    np.testing.assert_array_equal(plain.train.images[:, :, ::-1],
                                  flip.train.images)


def test_vectorized_transform_opt_in(fake_mnist):
    """`t.vectorized = True` hands the whole pool to the callable once."""
    root, _, _ = fake_mnist
    calls = []

    def t(pool):
        calls.append(pool.shape)
        return pool * 2.0
    t.vectorized = True

    class Cfg:
        dataset_name = "MNIST"
        train_range = range(0, 10)
        validation_range = range(10, 15)
        test_range = range(15, 20)
        transforms = [t]
        in_channels = 1

    ds = datasets.DatasetFromConfig(root, Cfg)
    assert len(calls) == 1 and len(calls[0]) == 4
    assert ds.train.images.max() > 1.0


def test_corrupt_labels_fail_loudly(fake_mnist, tmp_path):
    root, tr, _ = fake_mnist
    raw = os.path.join(root, "MNIST", "MNIST", "raw")
    _write_idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"),
                      np.full(20, 77, np.uint8))   # labels out of range
    with pytest.raises(ValueError, match="labels outside"):
        datasets.load_mnist_arrays(os.path.join(root, "MNIST"))


def test_truncated_images_fail_loudly(fake_mnist):
    root, tr, _ = fake_mnist
    raw = os.path.join(root, "MNIST", "MNIST", "raw")
    _write_idx_images(os.path.join(raw, "train-images-idx3-ubyte"), tr[:7])
    with pytest.raises(ValueError, match="inconsistent|truncated"):
        datasets.load_mnist_arrays(os.path.join(root, "MNIST"))


def test_contiguous_subset_is_a_view():
    """Contiguous split ranges (every shipped config) must not copy: the
    pool plus three fancy-indexed split copies would double dataset RAM."""
    from cnn_gp_tpu.data.datasets import ArrayDataset
    x = np.zeros((10, 1, 2, 2), np.float32)
    y = np.arange(10)
    d = ArrayDataset(x, y)
    sub = d.subset(range(2, 7))
    assert sub.images.base is x and len(sub) == 5
    np.testing.assert_array_equal(sub.labels, np.arange(2, 7))
    gap = d.subset([1, 4, 8])       # non-contiguous still copies
    assert gap.images.base is not x
    np.testing.assert_array_equal(gap.labels, [1, 4, 8])
    assert len(d.subset([])) == 0
