"""Cross-pipeline accuracy equivalence: reference vs this framework.

The strongest paper-parity proxy this zero-egress environment allows
(VERDICT.md "Next round" #3): run the reference's OWN unmodified
save_kernel -> classify_gp pipeline (via scripts/run_reference_pipeline.py)
and this framework's pipeline on the SAME synthetic IDX files with the SAME
config/splits, then assert

  * every persisted Gram dataset matches to 1e-5 of value scale, and
  * validation/test accuracies are identical.

Mirrors the reference's own orchestration (reference:
exp_mnist_resnet/run.bash:21-49) with one worker per pipeline.

Usage:
    python -m scripts.cross_pipeline --workdir=/tmp/xp --n_train=1024 \
        --n_val=256 --n_test=256 --batch=100
"""

import os
import re
import subprocess
import sys

import absl.app
import absl.flags
import h5py
import numpy as np

FLAGS = absl.flags.FLAGS
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, **kw)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{r.stdout[-2000:]}\n"
                           f"{r.stderr[-4000:]}")
    return r.stdout + r.stderr


def _accuracies(out):
    accs = {}
    for split in ("validation", "test"):
        m = re.search(rf"{split} accuracy: ([0-9.]+)%", out)
        assert m, f"no {split} accuracy in output:\n{out[-2000:]}"
        accs[split] = float(m.group(1))
    return accs


def run_equivalence(workdir, config="mnist_paper_convnet_gp", n_train=1024,
                    n_val=256, n_test=256, batch=100, jitter=0.0,
                    timeout=7200, verbose=True, hard=False):
    """Returns (ref_accs, our_accs, gram_rel_errors). Raises on mismatch.

    ``hard`` uses the non-separable dataset variant, so the asserted-equal
    accuracies sit well below 100% (evidence, not plumbing)."""
    os.makedirs(workdir, exist_ok=True)
    ds = os.path.join(workdir, "ds")
    pool = n_train + n_val                     # file 1 = train+val pool
    import configs as _configs
    kind = {"MNIST": "mnist", "CIFAR10": "cifar10"}[
        _configs.load(config).dataset_name]
    _run([sys.executable, "-m", "scripts.make_fake_dataset", kind, ds,
          str(pool), str(n_test)] + (["--hard"] if hard else []))
    ranges = dict(train=(0, n_train), val=(n_train, pool),
                  test=(pool, pool + n_test))

    # ---- reference pipeline (unmodified drivers via the shim runner)
    ref_h5 = os.path.join(workdir, "ref.h5")
    wrap = [sys.executable, "scripts/run_reference_pipeline.py"]
    sel = [f"--ref_config={config}"] + [
        f"--{k}={a}:{b}" for k, (a, b) in ranges.items()]
    if verbose:
        print(f"reference save_kernel (torch CPU, N={n_train}) ...",
              flush=True)
    _run(wrap + ["save_kernel"] + sel +
         ["--", f"--datasets_path={ds}", f"--batch_size={batch}",
          f"--out_path={ref_h5}"], timeout=timeout)
    ref_out = _run(wrap + ["classify_gp"] + sel +
                   ["--", f"--datasets_path={ds}", f"--in_path={ref_h5}",
                    f"--jitter={jitter}"], timeout=timeout)
    ref_accs = _accuracies(ref_out)

    # ---- this framework, same splits via a temporary config module
    cfg_name = "_cross_pipeline_tmp"
    cfg_path = os.path.join(REPO, "configs", f"{cfg_name}.py")
    with open(cfg_path, "w") as f:
        f.write(
            f"from configs.{config} import (dataset_name, transforms, "
            f"in_channels, out_channels, initial_model)\n"
            f"train_range = range{ranges['train']}\n"
            f"validation_range = range{ranges['val']}\n"
            f"test_range = range{ranges['test']}\n")
    our_h5 = os.path.join(workdir, "ours.h5")
    try:
        if verbose:
            print("our save_kernel ...", flush=True)
        _run([sys.executable, "-m", "exp_mnist_resnet.save_kernel",
              f"--config={cfg_name}", f"--datasets_path={ds}",
              f"--batch_size={batch}", f"--out_path={our_h5}"],
             timeout=timeout)
        our_out = _run([sys.executable, "-m", "exp_mnist_resnet.classify_gp",
                        f"--config={cfg_name}", f"--datasets_path={ds}",
                        f"--in_path={our_h5}", f"--jitter={jitter}"],
                       timeout=timeout)
        our_accs = _accuracies(our_out)
    finally:
        os.remove(cfg_path)

    # ---- Gram parity on every persisted dataset
    rels = {}
    with h5py.File(ref_h5, "r") as fr, h5py.File(our_h5, "r") as fo:
        for name in ("Kxx", "Kxvx", "Kxtx", "Kv_diag", "Kt_diag"):
            a = np.asarray(fr[name][0])
            b = np.asarray(fo[name][0])
            assert a.shape == b.shape, (name, a.shape, b.shape)
            m = np.isfinite(a)                 # reference: lower tri is NaN
            assert np.isfinite(b[m]).all(), f"{name}: holes in our store"
            rels[name] = float(np.abs(a[m] - b[m]).max()
                               / np.abs(a[m]).max())

    if verbose:
        print(f"reference accuracies: {ref_accs}")
        print(f"our accuracies:       {our_accs}")
        print("gram max rel errors:  "
              + ", ".join(f"{k}={v:.2e}" for k, v in rels.items()))
    bad = {k: v for k, v in rels.items() if v > 1e-5}
    assert not bad, f"Gram parity worse than 1e-5: {bad}"
    assert ref_accs == our_accs, (ref_accs, our_accs)
    return ref_accs, our_accs, rels


def main(_):
    run_equivalence(FLAGS.workdir, config=FLAGS.config,
                    n_train=FLAGS.n_train, n_val=FLAGS.n_val,
                    n_test=FLAGS.n_test, batch=FLAGS.batch,
                    jitter=FLAGS.jitter, hard=FLAGS.hard)
    print("cross-pipeline equivalence: PASS")


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("workdir", "/tmp/cross_pipeline", "scratch directory")
    f.DEFINE_string("config", "mnist_paper_convnet_gp", "architecture config")
    f.DEFINE_integer("n_train", 1024, "train examples")
    f.DEFINE_integer("n_val", 256, "validation examples")
    f.DEFINE_integer("n_test", 256, "test examples")
    f.DEFINE_integer("batch", 100, "Gram block size")
    f.DEFINE_float("jitter", 0.0, "diagonal jitter for both solves")
    f.DEFINE_boolean("hard", False,
                     "non-separable dataset variant (accuracy < 100%)")
    absl.app.run(main)
