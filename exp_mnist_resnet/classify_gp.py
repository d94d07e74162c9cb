"""Given a pre-computed kernel and a data set, compute accuracy.

CLI-compatible rebuild of the reference driver (reference:
exp_mnist_resnet/classify_gp.py:1-102): loads the (upper-triangle) train
Gram, adds --jitter to the diagonal, solves Kxx^-1 Y with +-1 one-hot
targets, reports validation/test accuracy.  A --solver flag adds the
TPU-native float32-Cholesky + float64-refinement path alongside the
reference's float64 scipy solve.
"""

import absl.app
import absl.flags
import numpy as np

import configs
from cnn_gp_tpu.data import DatasetFromConfig, open_store
from cnn_gp_tpu.ops import solve

FLAGS = absl.flags.FLAGS


def main(_):
    config = configs.load(FLAGS.config)
    dataset = DatasetFromConfig(FLAGS.datasets_path, config)

    print("Reading training labels")
    _, y = DatasetFromConfig.load_full(dataset.train)
    y_1hot = solve.one_hot_targets(y)

    with open_store(FLAGS.in_path, "r",
                    backend=FLAGS.store_backend) as f:
        # Refuse to solve on a Gram with NaN holes (e.g. an unmerged worker
        # shard): the reference would silently produce garbage accuracy
        # here; see SURVEY.md section 5 (failure detection).
        f.assert_complete("Kxx", upper_triangle_only=True)
        f.assert_complete("Kxvx")
        f.assert_complete("Kxtx")
        if FLAGS.solver == "chol_dist":
            # blocked-I/O large-N path: one float32 copy of the Gram (the
            # store's native dtype), never the 2x float64 materialisation
            from cnn_gp_tpu.parallel import chol_solve_dist_from_store
            print("Solving Kxx^{-1} Y (mesh-distributed blocked Cholesky)")
            a, rel, iters = chol_solve_dist_from_store(
                f, "Kxx", y_1hot, jitter=FLAGS.jitter)
            print(f"refined to rel residual {rel:.2e} in {iters} iterations")
            if rel > 1e-6:
                print("warning: refinement stagnated -- consider a larger "
                      "--jitter")
        else:
            print("Loading kernel")
            kxx = solve.symmetrize_from_upper(
                f.read("Kxx", dtype=np.float64))
            print("Solving Kxx^{-1} Y")
            a = solve.solve_gp(kxx, y_1hot, jitter=FLAGS.jitter,
                               method=FLAGS.solver)
            del kxx

        _, yv = DatasetFromConfig.load_full(dataset.validation)
        kxvx = f.read("Kxvx", dtype=np.float64)
        acc = solve.accuracy(solve.predict(kxvx, a), yv)
        print(f"validation accuracy: {acc * 100}%")
        del kxvx, yv

        _, yt = DatasetFromConfig.load_full(dataset.test)
        kxtx = f.read("Kxtx", dtype=np.float64)
        acc = solve.accuracy(solve.predict(kxtx, a), yt)
        print(f"test accuracy: {acc * 100}%")


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("datasets_path", "/tmp/datasets",
                    "where to load datasets from")
    f.DEFINE_string("config", "mnist", "which config to load from `configs`")
    f.DEFINE_string("in_path", None, "path of h5 file to load kernels from")
    f.DEFINE_float("jitter", 0.0, "add to the diagonal")
    f.DEFINE_string("store_backend", "auto",
                    "auto (by extension) | h5 | zarr")
    f.DEFINE_string("solver", "scipy",
                    "scipy (float64 LAPACK, reference parity) | chol "
                    "(device Cholesky) | chol_ir (float32 device Cholesky "
                    "+ float64 iterative refinement) | chol_dist "
                    "(mesh-distributed blocked Cholesky + refinement)")
    absl.app.run(main)
