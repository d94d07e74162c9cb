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

Serving protocol (BASELINE.md "Posterior serving"): add
``--save_posterior=/tmp/p.npz`` to a classify run, then measure the
solve-free serving wall in a fresh process with
``--serve_posterior=/tmp/p.npz`` and the same data flags.
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

    if FLAGS.serve_posterior:
        _serve(model, splits)
        return

    t0 = time.perf_counter()
    accs, info = classify_device_large(
        model, tr_x, tr_y, *splits,
        batch_size=FLAGS.batch_size, block=FLAGS.block,
        refine_iters=FLAGS.refine_iters,
        residual_check=FLAGS.residual_check,
        residual_accept_frac=FLAGS.residual_accept_frac,
        residual_sample_seed=(FLAGS.residual_sample_seed
                              if FLAGS.residual_sample_seed >= 0 else None),
        variances=FLAGS.variances)
    wall = time.perf_counter() - t0
    est = "~" if info["rel_residual_estimated"] else ""
    sampled = (f"sampled {info['rel_residual_sampled']:.2e} "
               if info["rel_residual_sampled"] is not None else "")
    if info.get("rel_residual_sampled_ucb") is not None:
        sampled += (f"(ucb {info['rel_residual_sampled_ucb']:.2e}, "
                    f"maxrow {info['rel_residual_maxrow_ratio']:.1f}, "
                    f"seed {info['residual_sample_seed']}) ")
    print(f"accs {accs} wall {wall:.1f}s rel {est}{info['rel_residual']:.2e} "
          f"(unrefined {info['rel_residual_unrefined']:.2e}) {sampled}"
          f"refinements {info['refinements']} "
          f"log_evidence {info['log_evidence']:.6g} "
          f"timings {info['timings_s']}",
          flush=True)
    if FLAGS.out_predictions:
        np.save(FLAGS.out_predictions, np.concatenate(info["predictions"]))
    if FLAGS.save_posterior:
        from cnn_gp_tpu.serving import save_posterior
        out = save_posterior(FLAGS.save_posterior, train_x=tr_x,
                             alpha=info["alpha"], scalings=info["scalings"],
                             jitter_raw=info["jitter_raw"],
                             config_name=FLAGS.config)
        print(f"posterior saved to {out}; serve it with a fresh\n"
              f"  python -m scripts.device_large_scale "
              f"--serve_posterior={out} <same data flags>", flush=True)

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


def _serve(model, splits):
    """Serving-mode timing: load the O(N) posterior and score the same
    synthetic splits in THIS fresh process with no solve (plus variances
    after the solve-free factor rebuild if --variances)."""
    from cnn_gp_tpu.serving import GPPredictor, load_posterior

    t0 = time.perf_counter()
    posterior = load_posterior(FLAGS.serve_posterior)
    predictor = GPPredictor(model, posterior, batch_size=FLAGS.batch_size)
    print(f"posterior loaded in {time.perf_counter() - t0:.1f}s "
          f"(n={posterior.n}, config={posterior.config_name!r})", flush=True)
    if FLAGS.variances:
        t0 = time.perf_counter()
        predictor.prepare_variances(block=FLAGS.block)
        print(f"factor rebuilt (no solve) in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    for i, (zx, zy) in enumerate(splits):
        t0 = time.perf_counter()
        pred = predictor.classify(zx)
        acc = float(np.mean(pred == np.asarray(zy)))
        print(f"split {i}: acc {acc} ({len(zx)} points in "
              f"{time.perf_counter() - t0:.1f}s)", flush=True)
        if FLAGS.variances:
            t0 = time.perf_counter()
            var = predictor.variances(zx)
            print(f"split {i}: var mean {var.mean():.4e} min {var.min():.4e} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)


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
    f.DEFINE_enum("residual_check", "sampled", ["sampled", "full"],
                  "'sampled' estimates the residual on ~1024 rows and "
                  "escalates to the exact sweep only near tol; 'full' "
                  "always pays the exact assembly-priced sweep")
    f.DEFINE_float("residual_accept_frac", 1.0,
                   "the sampled estimate's +3-SE upper confidence bound "
                   "must clear this fraction of tol to skip the exact "
                   "sweep (the bound prices the sampling error itself)")
    f.DEFINE_integer("residual_sample_seed", -1,
                     "seed for the randomized residual row sample; -1 "
                     "draws a fresh seed (recorded in the run output)")
    f.DEFINE_boolean("variances", False,
                     "also compute matrix-free GP posterior variances "
                     "(compared against the float64 oracle under "
                     "--check_scipy)")
    f.DEFINE_boolean("check_scipy", False,
                     "cross-check predictions against the float64 scipy "
                     "pipeline (explicit Grams; feasible to ~16k)")
    f.DEFINE_string("out_predictions", "", "optional .npy output path")
    f.DEFINE_string("save_posterior", "",
                    "persist the solved posterior (cnn_gp_tpu.serving) to "
                    "this path after the classify run")
    f.DEFINE_string("serve_posterior", "",
                    "SKIP the solve: load this posterior artifact and "
                    "serve the synthetic splits (same data flags/seed "
                    "regenerate them) — the serving-wall measurement")
    absl.app.run(main)
