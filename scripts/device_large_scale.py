"""Scale runs of the fully device-resident classification path.

Drives ``classify_device_large`` (parallel/device_large.py) on synthetic
arrays at a chosen N on the real chip, printing per-phase timings and the
scaled-space residual, and optionally cross-checks predictions against the
reference-parity float64 scipy pipeline (reference:
exp_mnist_resnet/classify_gp.py:17-27) — feasible up to ~16k, where the
explicit float64 Gram and the single-core LAPACK solve still fit this
host.  This is the protocol behind the BASELINE.md "Fully device-resident
classification" table:

    python -m scripts.device_large_scale --n_train=16384 --n_test=2048 \
        --check_scipy
    python -m scripts.device_large_scale --n_train=50000 --n_test=20000
"""

import time

import absl.app
import absl.flags
import numpy as np

import configs
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import classify_device_large, gram_in_memory

FLAGS = absl.flags.FLAGS


def main(_):
    config = configs.load(FLAGS.config)
    model = config.initial_model
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=FLAGS.n_train, n_test=FLAGS.n_test,
        shape=configs.image_shape(config), seed=FLAGS.seed)
    splits = [(te_x, te_y)]
    if FLAGS.n_validation:
        va_x, va_y = te_x[:FLAGS.n_validation], te_y[:FLAGS.n_validation]
        te_x, te_y = te_x[FLAGS.n_validation:], te_y[FLAGS.n_validation:]
        splits = [(va_x, va_y), (te_x, te_y)]

    t0 = time.perf_counter()
    accs, info = classify_device_large(
        model, tr_x, tr_y, *splits,
        batch_size=FLAGS.batch_size, block=FLAGS.block,
        refine_iters=FLAGS.refine_iters, variances=FLAGS.variances)
    wall = time.perf_counter() - t0
    print(f"accs {accs} wall {wall:.1f}s rel {info['rel_residual']:.2e} "
          f"(unrefined {info['rel_residual_unrefined']:.2e}) "
          f"refinements {info['refinements']} "
          f"log_evidence {info['log_evidence']:.6g} "
          f"timings {info['timings_s']}",
          flush=True)
    if FLAGS.out_predictions:
        np.save(FLAGS.out_predictions, np.concatenate(info["predictions"]))

    if FLAGS.check_scipy:
        t0 = time.perf_counter()
        kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=FLAGS.batch_size,
                                        progress=False), np.float64)
        kzx = np.asarray(gram_in_memory(model, te_x, tr_x,
                                        batch_size=FLAGS.batch_size,
                                        progress=False), np.float64)
        t1 = time.perf_counter()
        a_ref = solve.solve_gp(kxx.copy(), solve.one_hot_targets(tr_y),
                               method="scipy")
        t2 = time.perf_counter()
        agree = float(np.mean(solve.predict(kzx, a_ref)
                              == info["predictions"][-1]))
        print(f"scipy pipeline: gram+fetch {t1 - t0:.1f}s "
              f"solve {t2 - t1:.1f}s; prediction agreement: {agree}",
              flush=True)
        if FLAGS.variances:
            kzz = np.asarray(model(np.asarray(te_x, np.float32),
                                   diag=True), np.float64)
            t3 = time.perf_counter()
            want = solve.predictive_variance(kxx, kzx, kzz)
            got = np.asarray(info["variances"][-1], np.float64)
            scale = float(kzz.mean())
            print(f"variance oracle ({time.perf_counter() - t3:.1f}s): "
                  f"max |dev-f64|/scale = "
                  f"{np.abs(got - want).max() / scale:.2e}", flush=True)


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("config", "mnist_as_tf", "config name from `configs`")
    f.DEFINE_integer("n_train", 16384, "training examples")
    f.DEFINE_integer("n_test", 2048, "test (+validation) examples")
    f.DEFINE_integer("n_validation", 0,
                     "carve this many of n_test into a validation split")
    f.DEFINE_integer("batch_size", 128, "Gram tile size")
    f.DEFINE_integer("block", 2048, "Cholesky block size")
    f.DEFINE_integer("seed", 0, "synthetic data seed")
    f.DEFINE_integer("refine_iters", 1,
                     "refinement sweeps cap; 0 = solve once and report "
                     "the residual of the unrefined iterate (each sweep "
                     "costs ~ one assembly pass)")
    f.DEFINE_boolean("variances", False,
                     "also compute matrix-free GP posterior variances "
                     "(compared against the float64 oracle under "
                     "--check_scipy)")
    f.DEFINE_boolean("check_scipy", False,
                     "cross-check predictions against the float64 scipy "
                     "pipeline (explicit Grams; feasible to ~16k)")
    f.DEFINE_string("out_predictions", "", "optional .npy output path")
    absl.app.run(main)
