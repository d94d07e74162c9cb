"""Kernel model selection by GP marginal likelihood (evidence).

The reference framework chose between architectures by *accuracy on a
validation split* (its configs encode the winners of the paper's random
search); it computes no marginal likelihood anywhere.  With the evidence
now free at any N the device-resident path reaches
(``classify_device_large`` -> ``info["log_evidence"]``, the
log-determinant read off the live blocked factor), the principled
alternative is one command: rank kernels by ``log p(y | X)`` on the
TRAINING split alone — no validation data spent — and check the ranking
against held-out accuracy.

    python -m scripts.model_selection --n_train=2048 --n_test=512

runs every MNIST-shaped shipped config on the identical hard
(non-separable) synthetic task and prints one line per model:
evidence (total and per training point) and test accuracy.
"""

import time

import absl.app
import absl.flags
import numpy as np

import configs
from cnn_gp_tpu.parallel import classify_device_large
from scripts.make_fake_dataset import _digits

FLAGS = absl.flags.FLAGS


def main(_):
    # the identical raw data for every model: the hard non-separable
    # digits task (scripts/make_fake_dataset.py), scaled to [0, 1]
    tr_x8, tr_y = _digits(FLAGS.n_train, 28, seed=1, hard=True)
    te_x8, te_y = _digits(FLAGS.n_test, 28, seed=2, proto_seed=1,
                          hard=True)
    tr_x = (tr_x8[:, None].astype(np.float32) / 255.0)
    te_x = (te_x8[:, None].astype(np.float32) / 255.0)

    rows = []
    for name in FLAGS.models:
        model = configs.load(name).initial_model
        t0 = time.perf_counter()
        accs, info = classify_device_large(
            model, tr_x, tr_y, (te_x, te_y),
            batch_size=FLAGS.batch_size, block=FLAGS.block,
            jitter=FLAGS.jitter, verbose=False)
        rows.append((name, info["log_evidence"],
                     info["log_evidence"] / FLAGS.n_train, accs[0],
                     time.perf_counter() - t0))
        print(f"{name:32s} log_evidence {rows[-1][1]:.6g} "
              f"(per-datum {rows[-1][2]:.3f})  test_acc {accs[0]:.4f}  "
              f"[{rows[-1][4]:.1f}s]", flush=True)

    rows.sort(key=lambda r: -r[1])
    best = rows[0]
    print(f"\nevidence ranking: {' > '.join(r[0] for r in rows)}")
    print(f"selected {best[0]} (test_acc {best[3]:.4f}; "
          f"best test_acc {max(r[3] for r in rows):.4f})")


if __name__ == "__main__":
    # flags under the guard so the module stays importable next to other
    # flag-defining modules (absl DuplicateFlagError), matching
    # fit_hyperparams / mc_width_check / device_large_scale
    absl.flags.DEFINE_integer("n_train", 2048, "training examples")
    absl.flags.DEFINE_integer("n_test", 512, "held-out examples")
    absl.flags.DEFINE_integer("batch_size", 128, "Gram tile size")
    absl.flags.DEFINE_integer("block", 512, "factor block size")
    absl.flags.DEFINE_float("jitter", 0.0, "relative diagonal jitter")
    absl.flags.DEFINE_list(
        "models", ["mnist_paper_convnet_gp", "mnist_paper_residual_cnn_gp",
                   "mnist_as_tf"],
        "configs to rank (must share the input shape)")
    absl.app.run(main)
