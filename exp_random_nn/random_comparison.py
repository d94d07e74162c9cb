"""Monte-Carlo validation: finite random NNs vs the analytic kernel.

CLI-compatible rebuild of the reference driver (reference:
exp_random_nn/random_comparison.py:1-70): takes the first 100 training
images, computes the analytic covariance, draws ``n_samples`` finite random
networks via the ``model.nn()`` mirror, and writes two CSVs --
``{channels:04d}_{seed:04d}_samples.csv`` (normalised output of example 0)
and ``..._cov.csv`` (empirical vs analytic covariance per (i, j) pair).

The reference's 10,000-iteration Python loop over fresh ``.cuda()`` modules
becomes one vmapped, jitted sampling sweep (cnn_gp_tpu/finite.py).
"""

import os

import absl.app
import absl.flags
import jax
import numpy as np
import pandas as pd

import configs
from cnn_gp_tpu import sample_nn_outputs
from cnn_gp_tpu.data import DatasetFromConfig

FLAGS = absl.flags.FLAGS


def _atomic_to_csv(df, path):
    """Write-then-rename so a killed run never leaves a truncated CSV.

    run.bash's resume-by-skip uses a non-empty cov CSV as the completion
    marker; pandas ``to_csv`` is not atomic, so a mid-write kill (tunnel
    outage, OOM) would otherwise leave a partial file the battery skips
    forever and the figure silently plots."""
    tmp = path + ".tmp"
    df.to_csv(tmp, index=False)
    os.replace(tmp, path)


def main(_):
    config = configs.load(FLAGS.config)
    dataset = DatasetFromConfig(FLAGS.datasets_path, config)
    inputs = dataset.train.images[:100]
    model = config.initial_model

    true_cov = np.asarray(model(inputs))

    r = sample_nn_outputs(model, inputs, jax.random.key(FLAGS.seed),
                          n_samples=FLAGS.n_samples,
                          channels=FLAGS.channels,
                          in_channels=config.in_channels,
                          out_channels=1,
                          sample_batch=FLAGS.sample_batch or None)
    r = np.asarray(r)                       # [S, N]

    os.makedirs(FLAGS.out_path, exist_ok=True)
    samples_output_filename = os.path.join(
        FLAGS.out_path, f"{FLAGS.channels:04d}_{FLAGS.seed:04d}_samples.csv")
    _atomic_to_csv(pd.DataFrame({
        "r0": r[:, 0] / np.sqrt(true_cov[0, 0]),
    }), samples_output_filename)

    ni = inputs.shape[0]
    i = np.arange(ni) * np.ones([ni, 1])
    j = i.T
    est_cov = r.T @ r / FLAGS.n_samples

    cov_output_filename = os.path.join(
        FLAGS.out_path, f"{FLAGS.channels:04d}_{FLAGS.seed:04d}_cov.csv")
    _atomic_to_csv(pd.DataFrame({
        "i": i.ravel(),
        "j": j.ravel(),
        "est": est_cov.ravel(),
        "true": true_cov.ravel(),
    }), cov_output_filename)


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("datasets_path", "/tmp/datasets",
                    "where to load datasets from")
    f.DEFINE_string("out_path", None,
                    "where to save the drawn outputs of the NN and kernel")
    f.DEFINE_string("config", "cifar10", "which config to load from `configs`")
    f.DEFINE_integer("seed", 1, "the random seed")
    f.DEFINE_integer("channels", 30,
                     "the number of channels of the random finite NNs")
    f.DEFINE_integer("n_samples", 10000,
                     "Number of samples to draw from the NN")
    f.DEFINE_integer("sample_batch", 0,
                     "how many sampled networks to vmap per device step "
                     "(0 = auto-size to fit one chip's HBM)")
    absl.app.run(main)
