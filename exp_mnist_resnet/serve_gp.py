"""Serve a persisted GP posterior: predictions without re-solving.

TPU-native addition without a reference counterpart: the reference's
classify_gp re-runs the full O(N^3) LAPACK solve from the Gram HDF5 in
every process before it can score anything (reference:
exp_mnist_resnet/classify_gp.py:17-27).  This driver loads the O(N)
posterior artifact written by ``classify_e2e --large
--save_posterior=...`` (or ``cnn_gp_tpu.serving.save_posterior``) and
scores the config's validation/test splits immediately — add
``--variances`` for calibrated uncertainty after a solve-free factor
rebuild.

    python -m exp_mnist_resnet.serve_gp --config=mnist \
        --datasets_path=/tmp/datasets --posterior=/tmp/posterior.npz
"""

import time

import absl.app
import absl.flags
import numpy as np

import configs
from cnn_gp_tpu.data import DatasetFromConfig
from cnn_gp_tpu.ops.solve import accuracy
from cnn_gp_tpu.serving import GPPredictor, load_posterior

FLAGS = absl.flags.FLAGS


def main(_):
    config = configs.load(FLAGS.config)
    posterior = load_posterior(FLAGS.posterior)
    print(f"posterior: n={posterior.n} classes={posterior.alpha.shape[1]} "
          f"config={posterior.config_name!r} "
          f"variance-ready={posterior.scalings is not None}")
    if posterior.config_name and posterior.config_name != FLAGS.config:
        # a mismatched kernel serves silently wrong numbers — refuse
        raise SystemExit(
            f"posterior was solved under config "
            f"{posterior.config_name!r} but --config={FLAGS.config!r}; "
            f"pass the matching config (the kernel must be the one the "
            f"posterior was solved with)")
    dataset = DatasetFromConfig(FLAGS.datasets_path, config)
    predictor = GPPredictor(
        config.initial_model, posterior, batch_size=FLAGS.batch_size,
        allow_settings_mismatch=FLAGS.allow_settings_mismatch)

    if FLAGS.variances:
        t0 = time.perf_counter()
        predictor.prepare_variances(block=FLAGS.block,
                                    factor_cache=FLAGS.factor_cache or None)
        print(f"variance factor ready (no solve"
              f"{', cache at ' + FLAGS.factor_cache if FLAGS.factor_cache else ''}) "
              f"in {time.perf_counter() - t0:.1f}s")

    for name, split in (("validation", dataset.validation),
                        ("test", dataset.test)):
        if len(split.images) == 0:
            continue
        t0 = time.perf_counter()
        pred = predictor.classify(split.images)
        wall = time.perf_counter() - t0
        acc = accuracy(pred, np.asarray(split.labels))
        print(f"{name} accuracy: {acc * 100}%  "
              f"({len(pred)} points in {wall:.1f}s)")
        if FLAGS.variances:
            t0 = time.perf_counter()
            std = np.sqrt(predictor.variances(split.images))
            print(f"{name} predictive std: mean {std.mean():.4e}  "
                  f"min {std.min():.4e}  max {std.max():.4e}  "
                  f"({time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("datasets_path", "/tmp/datasets",
                    "where to load datasets from")
    f.DEFINE_string("config", "mnist", "which config to load from `configs`")
    f.DEFINE_string("posterior", None, "posterior .npz written by "
                    "classify_e2e --save_posterior / serving.save_posterior")
    f.mark_flag_as_required("posterior")
    f.DEFINE_integer("batch_size", 128, "Gram tile size for regeneration")
    f.DEFINE_boolean("variances", False,
                     "also serve GP posterior variances (rebuilds the "
                     "device factor once, solve-free)")
    f.DEFINE_integer("block", 2048, "Cholesky block size for the variance "
                     "factor rebuild")
    f.DEFINE_string("factor_cache", "", "opt-in on-disk factor cache "
                    "directory (an O(N^2) file): written on the first "
                    "--variances run, loaded instead of reassembled on "
                    "subsequent ones — measured 12.1s vs 42.9s at 16k "
                    "(BASELINE.md 'Serving: on-disk factor cache')")
    f.DEFINE_boolean("allow_settings_mismatch", False,
                     "serve a posterior recorded under different "
                     "kernel-lowering settings (cnn_gp_tpu.settings) — "
                     "the regenerated kernel then deviates from the one "
                     "alpha was solved against (bounded <5e-7)")
    absl.app.run(main)
