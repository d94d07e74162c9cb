"""Run the UNMODIFIED reference pipeline on this container.

The reference drivers (reference: exp_mnist_resnet/save_kernel.py,
classify_gp.py) need torchvision (absent here) and CUDA (CPU-only torch
here).  This wrapper installs two compatibility shims — a minimal
`torchvision` module whose `datasets.MNIST` reads the same raw IDX files
our loaders consume, and no-op `.cuda()` patches — then executes the
reference's own driver source, byte-for-byte unmodified, from
/root/reference.  This is what lets the cross-pipeline accuracy-equivalence
evidence (tests/test_cross_pipeline.py, BASELINE.md) say "the reference's
own code produced these numbers".

Usage:
    python scripts/run_reference_pipeline.py save_kernel \
        --ref_config=mnist_paper_convnet_gp --train=0:1024 --val=1024:1280 \
        --test=1280:1536 -- --datasets_path=... --batch_size=100 \
        --out_path=.../ref.h5
    python scripts/run_reference_pipeline.py classify_gp \
        --ref_config=... --train=... -- --datasets_path=... --in_path=...

Everything after `--` is forwarded verbatim to the reference driver's own
absl flags (plus `--config=__equiv__`, the range-overridden config this
wrapper injects).
"""

import importlib
import os
import runpy
import struct
import sys
import types

REFERENCE = "/root/reference"


# ---------------------------------------------------------------- shims

def _read_idx(path):
    import gzip
    import numpy as np
    opener = open
    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        opener, path = gzip.open, path + ".gz"
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        assert zero == 0, f"bad IDX magic in {path}"
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def install_torchvision_shim():
    import numpy as np
    import torch

    class ToTensor:
        """uint8 [H, W] -> float32 [1, H, W] in [0, 1] (torchvision
        semantics for grayscale)."""

        def __call__(self, img):
            a = np.asarray(img, np.float32) / 255.0
            if a.ndim == 2:
                a = a[None]
            elif a.ndim == 3:              # HWC (CIFAR) -> CHW
                a = a.transpose(2, 0, 1)
            return torch.from_numpy(np.ascontiguousarray(a))

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class MNIST:
        def __init__(self, root, train=True, download=False, transform=None):
            for cand in (os.path.join(root, "MNIST", "raw"),
                         os.path.join(root, "raw"), root):
                if os.path.exists(os.path.join(
                        cand, "train-images-idx3-ubyte")) or os.path.exists(
                        os.path.join(cand, "train-images-idx3-ubyte.gz")):
                    raw = cand
                    break
            else:
                raise FileNotFoundError(f"no raw MNIST IDX files under "
                                        f"{root}")
            stem = "train" if train else "t10k"
            self.data = _read_idx(
                os.path.join(raw, f"{stem}-images-idx3-ubyte"))
            self.targets = _read_idx(
                os.path.join(raw, f"{stem}-labels-idx1-ubyte"))
            self.transform = transform

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            img = self.data[i]
            if self.transform is not None:
                img = self.transform(img)
            return img, int(self.targets[i])

    class CIFAR10:
        """Reads the CIFAR-10 python pickle batches; presents torchvision's
        [N, 32, 32, 3] uint8 ``data`` + ``targets`` surface."""

        def __init__(self, root, train=True, download=False, transform=None):
            import pickle
            for cand in (os.path.join(root, "cifar-10-batches-py"),
                         os.path.join(root, "CIFAR10",
                                      "cifar-10-batches-py"), root):
                if os.path.exists(os.path.join(cand, "test_batch")):
                    base = cand
                    break
            else:
                raise FileNotFoundError(f"no CIFAR-10 batches under {root}")
            names = ([f"data_batch_{i}" for i in range(1, 6)] if train
                     else ["test_batch"])
            xs, ys = [], []
            for nm in names:
                with open(os.path.join(base, nm), "rb") as f:
                    e = pickle.load(f, encoding="latin1")
                xs.append(np.asarray(e["data"], np.uint8)
                          .reshape(-1, 3, 32, 32))
                ys.extend(e["labels"])
            self.data = np.concatenate(xs).transpose(0, 2, 3, 1)  # HWC
            self.targets = [int(t) for t in ys]
            self.transform = transform

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            img = self.data[i]
            if self.transform is not None:
                img = self.transform(img)
            return img, int(self.targets[i])

    tv = types.ModuleType("torchvision")
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.datasets.MNIST = MNIST
    tv.datasets.CIFAR10 = CIFAR10
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.ToTensor = ToTensor
    tv.transforms.Compose = Compose
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.transforms"] = tv.transforms

    # CPU-only torch: make .cuda() a no-op so the unmodified drivers run
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    # the reference targets numpy < 1.24 (uses the removed np.int alias at
    # reference: cnn_gp/data.py:12); restore it for this process
    if not hasattr(np, "int"):
        np.int = int


def install_equiv_config(ref_config, train, val, test):
    """Import the reference's real config module and override its split
    ranges; register as configs.__equiv__ for the drivers to load."""
    cfg = importlib.import_module(f"configs.{ref_config}")
    equiv = types.ModuleType("configs.__equiv__")
    for k in dir(cfg):
        if not k.startswith("_"):
            setattr(equiv, k, getattr(cfg, k))
    if train:
        equiv.train_range = range(*train)
    if val:
        equiv.validation_range = range(*val)
    if test:
        equiv.test_range = range(*test)
    sys.modules["configs.__equiv__"] = equiv


def main():
    args = sys.argv[1:]
    assert args and args[0] in ("save_kernel", "classify_gp"), (
        "first arg must be save_kernel | classify_gp")
    driver = args[0]

    ref_config, train, val, test = "mnist_paper_convnet_gp", None, None, None
    fwd = []
    it = iter(args[1:])
    for a in it:
        if a == "--":
            fwd = list(it)
            break
        key, _, val_s = a.partition("=")
        if key == "--ref_config":
            ref_config = val_s
        elif key in ("--train", "--val", "--test"):
            lo, hi = map(int, val_s.split(":"))
            if key == "--train":
                train = (lo, hi)
            elif key == "--val":
                val = (lo, hi)
            else:
                test = (lo, hi)
        else:
            raise SystemExit(f"unknown wrapper arg {a}; put driver flags "
                             f"after `--`")

    # the reference's own packages (cnn_gp, configs) take import priority
    sys.path.insert(0, REFERENCE)
    install_torchvision_shim()
    install_equiv_config(ref_config, train, val, test)

    path = os.path.join(REFERENCE, "exp_mnist_resnet", f"{driver}.py")
    sys.argv = [path, "--config=__equiv__"] + fwd
    runpy.run_path(path, run_name="__main__")


if __name__ == "__main__":
    main()
