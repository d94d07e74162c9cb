"""Generate synthetic datasets in the real on-disk formats.

This environment has no network egress, so the true MNIST/CIFAR-10 files
cannot be downloaded.  This tool writes *synthetic* data in the exact
formats the loaders consume (MNIST IDX, CIFAR-10 pickle batches) so the
full real-data pipeline -- IDX parsing, concat-then-split, the paper
configs, multi-worker Gram assembly, solve -- can be rehearsed end to end
at any scale.

Usage:
    python -m scripts.make_fake_dataset mnist  <datasets_path> [n_train n_test]
    python -m scripts.make_fake_dataset cifar10 <datasets_path> [n_train n_test]

``--hard`` (both kinds) makes the task genuinely non-separable (blended
prototypes, heavy noise, 5% label flips) so pipeline-equivalence checks
assert non-trivial accuracies.
"""

import os
import pickle
import struct
import sys

import numpy as np


def _idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))
        f.write(struct.pack(">III", *arr.shape))
        f.write(arr.tobytes())


def _idx_labels(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", len(arr)))
        f.write(arr.astype(np.uint8).tobytes())


def _digits(n, side, seed, proto_seed=None, hard=False,
            flip_frac=0.05):
    """Digit-like images: class prototype blobs + noise, uint8.

    The prototypes must be SHARED between the train and test files
    (``proto_seed``) or the two splits are different tasks and test
    accuracy is meaningless -- real MNIST's train/test are i.i.d.

    ``hard`` makes the task genuinely non-separable (every image is a
    random convex blend of its class prototype with another class's, under
    heavier pixel noise, plus 5% label noise), so classifiers land at a
    non-trivial accuracy well below 100% -- the regime where accuracy
    *equivalence* between two pipelines is evidence rather than plumbing
    (round-1 VERDICT "What's weak" #5).
    """
    proto_rng = np.random.RandomState(
        seed if proto_seed is None else proto_seed)
    protos = (proto_rng.rand(10, side, side) ** 2 * 255).astype(np.float32)
    rng = np.random.RandomState(seed)
    rng.rand(10, side, side)  # keep the seed=1 train stream byte-stable
    y = rng.randint(0, 10, n)
    x = protos[y] * (0.6 + 0.4 * rng.rand(n, 1, 1))
    if hard:
        other = (y + rng.randint(1, 10, n)) % 10   # confuser class
        blend = rng.uniform(0.15, 0.5, (n, 1, 1)).astype(np.float32)
        x = x * (1 - blend) + protos[other] * blend * (
            0.6 + 0.4 * rng.rand(n, 1, 1))
        x += 45 * rng.randn(n, side, side)
        # label noise: default 5%; flip_frac=0 gives the ZERO-label-noise
        # variant whose accuracy ceiling is NOT capped by the flips, so
        # held-out metrics can discriminate between kernels (VERDICT r4
        # item 1).  The rng draws are identical for any flip_frac, so the
        # default stream (and on-disk fake datasets) is byte-stable.
        flip = rng.rand(n) < flip_frac
        y = np.where(flip, rng.randint(0, 10, n), y)
    else:
        x += 30 * rng.randn(n, side, side)
    return np.clip(x, 0, 255).astype(np.uint8), y.astype(np.int64)


def make_mnist(root, n_train=60000, n_test=10000, hard=False):
    raw = os.path.join(root, "MNIST", "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    tr_x, tr_y = _digits(n_train, 28, seed=1, hard=hard)
    te_x, te_y = _digits(n_test, 28, seed=2, proto_seed=1, hard=hard)
    _idx_images(os.path.join(raw, "train-images-idx3-ubyte"), tr_x)
    _idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"), tr_y)
    _idx_images(os.path.join(raw, "t10k-images-idx3-ubyte"), te_x)
    _idx_labels(os.path.join(raw, "t10k-labels-idx1-ubyte"), te_y)
    print(f"wrote fake MNIST ({n_train}+{n_test}"
          f"{', hard' if hard else ''}) under {raw}")


def make_cifar10(root, n_train=50000, n_test=10000, hard=False):
    d = os.path.join(root, "CIFAR10", "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    per = [n_train // 5] * 5                 # the loader wants 5 batches
    per[0] += n_train - sum(per)
    # one shared prototype set across ALL batches (see _digits docstring)
    for i in range(1, 6):
        x, y = _digits(per[i - 1], 32, seed=10 + i, proto_seed=10,
                       hard=hard)
        # explicit width: reshape(len(x), -1) cannot infer -1 for an
        # empty batch (n_train < 5 leaves later batches with 0 rows)
        data = np.repeat(x[:, None], 3, axis=1).reshape(len(x), 3 * 32 * 32)
        with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
            pickle.dump({"data": data, "labels": y.tolist()}, f)
    x, y = _digits(n_test, 32, seed=99, proto_seed=10, hard=hard)
    data = np.repeat(x[:, None], 3, axis=1).reshape(len(x), 3 * 32 * 32)
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({"data": data, "labels": y.tolist()}, f)
    print(f"wrote fake CIFAR-10 ({n_train}+{n_test}"
          f"{', hard' if hard else ''}) under {d}")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--hard"]
    hard = "--hard" in sys.argv
    kind = argv[0]
    root = argv[1]
    if kind == "mnist":
        n_train = int(argv[2]) if len(argv) > 2 else 60000
        n_test = int(argv[3]) if len(argv) > 3 else 10000
        make_mnist(root, n_train, n_test, hard=hard)
    elif kind == "cifar10":
        n_train = int(argv[2]) if len(argv) > 2 else 50000
        n_test = int(argv[3]) if len(argv) > 3 else 10000
        make_cifar10(root, n_train, n_test, hard=hard)
    else:
        raise SystemExit(f"unknown dataset kind {kind!r}")
