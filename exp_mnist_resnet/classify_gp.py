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
    if (FLAGS.variances or FLAGS.evidence) and FLAGS.solver not in (
            "scipy", "chol_dist"):
        raise SystemExit(
            "--variances/--evidence need a factor to whiten against: use "
            "--solver=scipy (float64 oracle, one factorisation serves "
            "solve+variances+evidence) or --solver=chol_dist (float32 "
            "device factor)")
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
        if FLAGS.variances:
            # the z-diagonals were written by worker rank 0 alongside the
            # cross Grams (reference: save_kernel.py:33-36), so variance
            # reporting needs nothing beyond the checkpointed artifact
            f.assert_complete("Kv_diag")
            f.assert_complete("Kt_diag")
        variances = evidence = None
        if FLAGS.solver == "chol_dist":
            # blocked-I/O large-N path: one float32 copy of the Gram (the
            # store's native dtype), never the 2x float64 materialisation
            from cnn_gp_tpu.parallel.chol_dist import (
                chol_solve_dist_from_store, evidence_from_factor,
                variances_from_cross_host)
            print("Solving Kxx^{-1} Y (mesh-distributed blocked Cholesky)")
            out = chol_solve_dist_from_store(
                f, "Kxx", y_1hot, jitter=FLAGS.jitter,
                return_factor=FLAGS.variances or FLAGS.evidence)
            a, rel, iters = out[:3]
            print(f"refined to rel residual {rel:.2e} in {iters} iterations")
            if rel > 1e-6:
                print("warning: refinement stagnated -- consider a larger "
                      "--jitter")
            if len(out) > 3:
                factor, s = out[3], out[4]
                if FLAGS.evidence or FLAGS.variances:
                    evidence = evidence_from_factor(factor, s, y_1hot, a)
                if FLAGS.variances:
                    # float32-factor accuracy floor ~eps32 * k_zz (the
                    # float64 oracle is the scipy path below)
                    variances = [
                        variances_from_cross_host(
                            factor, s, f.read(kn), f.read(dn))
                        for kn, dn in (("Kxvx", "Kv_diag"),
                                       ("Kxtx", "Kt_diag"))]
        else:
            print("Loading kernel")
            kxx = solve.symmetrize_from_upper(
                f.read("Kxx", dtype=np.float64))
            print("Solving Kxx^{-1} Y")
            if FLAGS.variances or FLAGS.evidence:
                # ONE factorisation serves solve + variances + evidence
                splits = ([(f.read("Kxvx"), f.read("Kv_diag")),
                           (f.read("Kxtx"), f.read("Kt_diag"))]
                          if FLAGS.variances else [])
                stats = solve.solve_gp_stats(kxx, y_1hot,
                                             jitter=FLAGS.jitter,
                                             splits=splits)
                a = stats["alpha"]
                evidence = stats["log_evidence"]
                variances = stats["variances"] if FLAGS.variances else None
            else:
                a = solve.solve_gp(kxx, y_1hot, jitter=FLAGS.jitter,
                                   method=FLAGS.solver)
            del kxx

        if evidence is not None:
            print(f"train log evidence: {evidence:.6g}")

        _, yv = DatasetFromConfig.load_full(dataset.validation)
        kxvx = f.read("Kxvx", dtype=np.float64)
        acc = solve.accuracy(solve.predict(kxvx, a), yv)
        print(f"validation accuracy: {acc * 100}%")
        if variances is not None:
            std = np.sqrt(variances[0])
            print(f"validation predictive std: mean {std.mean():.4e}  "
                  f"min {std.min():.4e}  max {std.max():.4e}")
        del kxvx, yv

        _, yt = DatasetFromConfig.load_full(dataset.test)
        kxtx = f.read("Kxtx", dtype=np.float64)
        acc = solve.accuracy(solve.predict(kxtx, a), yt)
        print(f"test accuracy: {acc * 100}%")
        if variances is not None:
            std = np.sqrt(variances[1])
            print(f"test predictive std: mean {std.mean():.4e}  "
                  f"min {std.min():.4e}  max {std.max():.4e}")


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
    f.DEFINE_boolean("variances", False,
                     "also report GP posterior predictive-std summaries "
                     "per split from the stored Kv_diag/Kt_diag (float64 "
                     "oracle under --solver=scipy; float32-factor floor "
                     "under --solver=chol_dist).  The reference has no "
                     "uncertainty output")
    f.DEFINE_boolean("evidence", False,
                     "also report the train GP log marginal likelihood "
                     "(implied by --variances)")
    absl.app.run(main)
