"""Seeded width-100 MC covariance check (one config, one width).

Statistical gate for the finite-NN mirror at REAL paper width: draws
``n_samples`` width-``channels`` networks from a config's ``nn()`` and
reports how the empirical output covariance compares with the analytic
kernel entrywise, in units of the Monte-Carlo error bars (per-entry std
of a Gaussian covariance estimate: ``sqrt((K_ii K_jj + K_ij^2) / S)``).

For configs with a true GP correspondence (convnet/resnet/cifar) the
z-scores sit inside the error bars at width 100.  For
``mnist_paper_residual_cnn_gp`` they deliberately do NOT: the replicated
paper bug sums branches after the ReLU (non-Gaussian, non-zero-mean),
so the branch cross-moments the Sum kernel drops are real — the
reference's own README documents the broken correspondence (reference:
README.md:194-205; measured here: mean_rel ~1.16, z ~50 at width 100).
tests/test_mc_convergence.py asserts both signatures.

Prints one JSON line {"max_abs_z": ..., "mean_rel": ..., "n": ...}.
Exits 42 if no TPU is available (the CPU cost at width 100 is hours).

    python -m scripts.mc_width_check --config=mnist_paper_convnet_gp
"""

import json
import sys

import absl.app
import absl.flags
import numpy as np

FLAGS = absl.flags.FLAGS


def main(_):
    import jax

    if jax.default_backend() not in ("tpu",) and not FLAGS.allow_cpu:
        print("mc_width_check: no TPU backend; refusing the width-100 "
              "CPU run", file=sys.stderr)
        raise SystemExit(42)

    import configs
    from cnn_gp_tpu import sample_nn_outputs

    config = configs.load(FLAGS.config)
    shape = configs.image_shape(config)
    rng = np.random.RandomState(FLAGS.seed)
    x = rng.rand(FLAGS.n_images, *shape).astype(np.float32)

    model = config.initial_model
    true_cov = np.asarray(model(x), np.float64)

    r = np.asarray(sample_nn_outputs(
        model, x, jax.random.key(FLAGS.seed), n_samples=FLAGS.n_samples,
        channels=FLAGS.channels, in_channels=config.in_channels,
        out_channels=1, sample_batch=FLAGS.sample_batch), np.float64)
    est = r.T @ r / FLAGS.n_samples

    d = np.diagonal(true_cov)
    std = np.sqrt((d[:, None] * d[None, :] + true_cov ** 2)
                  / FLAGS.n_samples)
    z = np.abs(est - true_cov) / std
    out = {
        "max_abs_z": float(z.max()),
        "mean_rel": float(np.abs(est - true_cov).mean()
                          / np.abs(true_cov).mean()),
        "n": int(FLAGS.n_images), "samples": int(FLAGS.n_samples),
        "channels": int(FLAGS.channels), "config": FLAGS.config,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("config", "mnist_paper_residual_cnn_gp", "config name")
    f.DEFINE_integer("channels", 100, "finite-net width")
    f.DEFINE_integer("n_samples", 4000, "MC draws")
    f.DEFINE_integer("n_images", 16, "images (covariance is n x n)")
    f.DEFINE_integer("sample_batch", 64, "draws per vmapped batch")
    f.DEFINE_integer("seed", 0, "rng seed")
    f.DEFINE_boolean("allow_cpu", False, "permit the (very slow) CPU run")
    absl.app.run(main)
