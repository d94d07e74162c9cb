"""One-shot GP classification: dataset -> device-resident Gram -> solve.

TPU-native addition without a reference counterpart: where the reference
splits the experiment into save_kernel -> merge -> classify_gp through
HDF5 files (reference: exp_mnist_resnet/run.bash:21-49), this driver keeps
the Gram on device end to end (cnn_gp_tpu/parallel/device_pipeline.py) --
the right shape for interactive runs and for datasets whose Gram fits in
HBM.  Use the store-based drivers for checkpointed multi-worker fleets.
"""

import time

import absl.app
import absl.flags
import numpy as np

import configs
from cnn_gp_tpu.data import DatasetFromConfig
from cnn_gp_tpu.parallel import classify_device, classify_device_large

FLAGS = absl.flags.FLAGS


def main(_):
    config = configs.load(FLAGS.config)
    dataset = DatasetFromConfig(FLAGS.datasets_path, config)

    t0 = time.perf_counter()
    splits = [(dataset.validation.images, dataset.validation.labels),
              (dataset.test.images, dataset.test.labels)]
    variances = None
    if FLAGS.large:
        # matrix-free large-N path: blocked in-place sharded Cholesky,
        # nothing N^2 ever leaves the device (device_large.py)
        accs, info = classify_device_large(
            config.initial_model,
            dataset.train.images, dataset.train.labels, *splits,
            batch_size=FLAGS.batch_size, block=FLAGS.block,
            jitter=FLAGS.jitter, refine_iters=FLAGS.refine_iters,
            residual_check=FLAGS.residual_check,
            residual_accept_frac=FLAGS.residual_accept_frac,
            residual_sample_seed=(FLAGS.residual_sample_seed
                                  if FLAGS.residual_sample_seed >= 0
                                  else None),
            variances=FLAGS.variances)
        variances = info["variances"]
        est = "~" if info["rel_residual_estimated"] else ""
        print(f"rel residual {est}{info['rel_residual']:.2e} after "
              f"{info['refinements']} refinements; "
              f"log evidence {info['log_evidence']:.6g}; "
              f"timings {info['timings_s']}")
        if FLAGS.save_posterior:
            from cnn_gp_tpu.serving import save_posterior
            out = save_posterior(
                FLAGS.save_posterior, train_x=dataset.train.images,
                alpha=info["alpha"], scalings=info["scalings"],
                jitter_raw=info["jitter_raw"], config_name=FLAGS.config)
            print(f"posterior saved to {out} (serve with "
                  f"exp_mnist_resnet.serve_gp — no re-solve)")
    else:
        out = classify_device(
            config.initial_model,
            dataset.train.images, dataset.train.labels, *splits,
            batch_size=FLAGS.batch_size, jitter=FLAGS.jitter,
            refine=FLAGS.refine, variances=FLAGS.variances)
        accs, variances = out if FLAGS.variances else (out, None)
    if variances is not None:
        for name, v in zip(("validation", "test"), variances):
            std = np.sqrt(v)
            print(f"{name} predictive std: mean {std.mean():.4e}  "
                  f"min {std.min():.4e}  max {std.max():.4e}")
    elapsed = time.perf_counter() - t0
    print(f"validation accuracy: {accs[0] * 100}%")
    print(f"test accuracy: {accs[1] * 100}%")
    print(f"total wall time: {elapsed:.1f}s")


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("datasets_path", "/tmp/datasets",
                    "where to load datasets from")
    f.DEFINE_string("config", "mnist", "which config to load from `configs`")
    f.DEFINE_integer("batch_size", 128, "Gram tile size")
    f.DEFINE_float("jitter", 1e-6, "added to the scale-normalised diagonal")
    f.DEFINE_boolean("variances", False,
                     "also compute GP posterior variances per split and "
                     "print predictive-std summaries (the reference has "
                     "no uncertainty output)")
    f.DEFINE_boolean("refine", True,
                     "float64 host refinement of the float32 device solve")
    f.DEFINE_boolean("large", False,
                     "use the matrix-free large-N path (blocked sharded "
                     "Cholesky; the Gram never leaves the device)")
    f.DEFINE_integer("block", 2048, "Cholesky block size (--large).  At "
                     "N near the HBM edge shrink it: per-step temporaries "
                     "are ~3*N_pad*block floats on top of the N_pad^2 "
                     "buffer (60k on a 16 GB v5e ran with block=1024, "
                     "BASELINE.md)")
    f.DEFINE_integer("refine_iters", 1,
                     "refinement matvec passes cap (--large)")
    f.DEFINE_enum("residual_check", "sampled", ["sampled", "full"],
                  "with --large: 'sampled' measures the solve residual on "
                  "~1024 randomly drawn rows (~4% of a full regeneration "
                  "sweep at 50k; fresh seeded sample per run) and "
                  "escalates to the exact check only when the estimate is "
                  "within the accept margin of tol; 'full' always pays "
                  "the exact assembly-priced sweep")
    f.DEFINE_integer("residual_sample_seed", -1,
                     "with --large: seed for the randomized residual row "
                     "sample; -1 draws a fresh seed per run")
    f.DEFINE_float("residual_accept_frac", 1.0,
                   "with --large: the sampled estimate's +3-SE upper "
                   "confidence bound must clear this fraction of tol to "
                   "skip the exact sweep (the bound prices the sampling "
                   "error itself; lower for extra conservatism)")
    f.DEFINE_string("save_posterior", "",
                    "with --large: persist the solved posterior (O(N) "
                    "artifact) to this path for re-solve-free serving via "
                    "exp_mnist_resnet.serve_gp")
    absl.app.run(main)
