"""Given a pre-computed kernel and a data set, compute accuracy.

CLI-compatible rebuild of the reference driver (reference:
exp_mnist_resnet/classify_gp.py:1-102): loads the (upper-triangle) train
Gram, adds --jitter to the diagonal, solves Kxx^-1 Y with +-1 one-hot
targets, reports validation/test accuracy.  A --solver flag adds the
TPU-native float32-Cholesky + float64-refinement path alongside the
reference's float64 scipy solve.
"""

import time

import absl.app
import absl.flags
import numpy as np

import configs
from cnn_gp_tpu.data import DatasetFromConfig, open_store
from cnn_gp_tpu.ops import solve

FLAGS = absl.flags.FLAGS


def _ticker():
    t = [time.perf_counter()]

    def tick(name):
        now = time.perf_counter()
        print(f"[classify_gp] {name}: {now - t[0]:.1f}s", flush=True)
        t[0] = now

    return tick


def main(_):
    tick = _ticker()
    want_var = FLAGS.variances or FLAGS.lpd
    if (want_var or FLAGS.evidence) and FLAGS.solver not in (
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
    tick("labels")

    # Refusal contract (SURVEY.md section 5, failure detection): a Gram
    # with NaN holes (e.g. an unmerged worker shard) — which the reference
    # would silently turn into garbage accuracy — is refused.  The check
    # runs on the IN-MEMORY copy each array gets loaded into anyway: a
    # store-level `assert_complete` scan of Kxx costs a second full
    # read+decompress of the N^2 dataset (a measured multi-minute leg of
    # the 50k wall).
    def checked(name, arr):
        if np.isnan(np.asarray(arr)).any():
            raise RuntimeError(
                f"{name} has NaN holes (incomplete or unmerged "
                f"assembly?); rerun assembly — tile-level resume will "
                f"skip finished tiles")
        return arr

    with open_store(FLAGS.in_path, "r",
                    backend=FLAGS.store_backend) as f:
        variances = evidence = None
        if FLAGS.solver == "chol_dist":
            # blocked-I/O large-N path: one float32 copy of the Gram (the
            # store's native dtype), never the 2x float64 materialisation
            from cnn_gp_tpu.parallel.chol_dist import (
                chol_solve_dist_from_store, chol_solve_stream_from_store,
                evidence_from_factor, variances_from_cross_host)
            print("Solving Kxx^{-1} Y (mesh-distributed blocked Cholesky)")
            if FLAGS.stream:
                # overlap read+mirror with the device upload (identical
                # outputs; ~2x on the Kxx->factor leg at 50k)
                out = chol_solve_stream_from_store(
                    f, "Kxx", y_1hot, jitter=FLAGS.jitter,
                    check_finite=True, verbose=True,
                    return_factor=want_var or FLAGS.evidence)
            else:
                out = chol_solve_dist_from_store(
                    f, "Kxx", y_1hot, jitter=FLAGS.jitter,
                    check_finite=True,
                    return_factor=want_var or FLAGS.evidence)
            a, rel, iters = out[:3]
            print(f"refined to rel residual {rel:.2e} in {iters} iterations")
            if rel > 1e-6:
                print("warning: refinement stagnated -- consider a larger "
                      "--jitter")
            tick("solve (incl. Kxx read)")
        else:
            print("Loading kernel")
            kxx = checked("Kxx", solve.symmetrize_from_upper(
                f.read("Kxx", dtype=np.float64)))
            tick("Kxx read+symmetrize")
            print("Solving Kxx^{-1} Y")

        # cross Grams: read ONCE in the store's native float32 and reuse
        # for variances AND scores (reading them twice — f32 for
        # whitening, f64 for predict — paid the decompress cost twice)
        _, yv = DatasetFromConfig.load_full(dataset.validation)
        _, yt = DatasetFromConfig.load_full(dataset.test)
        kxvx = checked("Kxvx", f.read("Kxvx"))
        kxtx = checked("Kxtx", f.read("Kxtx"))
        diags = None
        if want_var:
            # the z-diagonals were written by worker rank 0 alongside the
            # cross Grams (reference: save_kernel.py:33-36), so variance
            # reporting needs nothing beyond the checkpointed artifact
            diags = (checked("Kv_diag", f.read("Kv_diag")),
                     checked("Kt_diag", f.read("Kt_diag")))
        tick("cross-Gram read")

        if FLAGS.solver == "chol_dist":
            if len(out) > 3:
                factor, s = out[3], out[4]
                if FLAGS.evidence or want_var:
                    evidence = evidence_from_factor(factor, s, y_1hot, a)
                if want_var:
                    # float32-factor accuracy floor ~eps32 * k_zz (the
                    # float64 oracle is the scipy path below)
                    variances = [
                        variances_from_cross_host(factor, s, kzx, dg)
                        for kzx, dg in ((kxvx, diags[0]),
                                        (kxtx, diags[1]))]
                tick("variances+evidence")
        else:
            if want_var or FLAGS.evidence:
                # ONE factorisation serves solve + variances + evidence
                splits = ([(kxvx, diags[0]), (kxtx, diags[1])]
                          if want_var else [])
                stats = solve.solve_gp_stats(kxx, y_1hot,
                                             jitter=FLAGS.jitter,
                                             splits=splits)
                a = stats["alpha"]
                evidence = stats["log_evidence"]
                variances = stats["variances"] if want_var else None
            else:
                a = solve.solve_gp(kxx, y_1hot, jitter=FLAGS.jitter,
                                   method=FLAGS.solver)
            del kxx
            tick("solve")

    if evidence is not None:
        print(f"train log evidence: {evidence:.6g}")

    # float32 cross-Gram scores: exact — the store's data is float32, so
    # upcasting inside predict reproduces the old read-as-float64 values
    scores = np.asarray(kxvx, a.dtype) @ a
    acc = solve.accuracy(np.argmax(scores, axis=1), yv)
    print(f"validation accuracy: {acc * 100}%")
    if FLAGS.variances:
        std = np.sqrt(variances[0])
        print(f"validation predictive std: mean {std.mean():.4e}  "
              f"min {std.min():.4e}  max {std.max():.4e}")
    if FLAGS.lpd:
        # held-out log predictive density: the calibration metric the
        # device pipeline reports (classify_device_large) and type-II ML
        # optimises for — accuracy saturates at a task's label-noise
        # ceiling while LPD keeps separating models (BASELINE.md).  The
        # observation noise is the --jitter the solve added.
        lpd, se, _ = solve.gaussian_lpd(scores, variances[0], yv,
                                        noise=FLAGS.jitter)
        print(f"validation lpd: {lpd:.4f} +- {se:.4f} nats/point")
    del kxvx

    scores = np.asarray(kxtx, a.dtype) @ a
    acc = solve.accuracy(np.argmax(scores, axis=1), yt)
    print(f"test accuracy: {acc * 100}%")
    if FLAGS.variances:
        std = np.sqrt(variances[1])
        print(f"test predictive std: mean {std.mean():.4e}  "
              f"min {std.min():.4e}  max {std.max():.4e}")
    if FLAGS.lpd:
        lpd, se, _ = solve.gaussian_lpd(scores, variances[1], yt,
                                        noise=FLAGS.jitter)
        print(f"test lpd: {lpd:.4f} +- {se:.4f} nats/point")
    tick("predict")


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
    f.DEFINE_boolean("lpd", False,
                     "also report held-out log predictive density "
                     "(mean +- SE nats/point) per split — needs the "
                     "posterior variances, so the --variances solver "
                     "rules apply; the noise is --jitter")
    f.DEFINE_boolean("stream", True,
                     "--solver=chol_dist only: stream the Kxx read/"
                     "mirror/upload legs concurrently (identical "
                     "outputs; the serial path is kept for A/B timing)")
    absl.app.run(main)
