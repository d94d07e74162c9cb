"""Type-II ML demo: recover Conv2d hyperparameters by marginal likelihood.

The reference fixes ``var_weight``/``var_bias`` to values found by random
search (reference: cnn_gp/kernels.py:61-76 defaults;
configs/mnist_paper_convnet_gp.py:16-30's 7.86/2.79 come from the paper's
search).  Because this framework's layers are pytrees,
``Conv2d(..., learnable=True)`` turns those hyperparameters into
differentiable leaves, and ``cnn_gp_tpu.fit`` optimises them by gradient
descent on the exact GP marginal likelihood — a capability the reference
does not have.

This script draws targets from a ground-truth kernel with known
(var_weight, var_bias), then fits a mis-initialised learnable model and
reports the recovered values and the NMLL gap to the truth:

    python -m scripts.fit_hyperparams --steps=80
"""

import absl.app
import absl.flags
import jax
import jax.numpy as jnp
import numpy as np

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.fit import fit, neg_marginal_log_likelihood

FLAGS = absl.flags.FLAGS


def make_model(var_weight, var_bias, learnable=False):
    """The demo architecture, shared with tests/test_fit.py."""
    return G.Sequential(
        G.Conv2d(5, var_weight=var_weight, var_bias=var_bias,
                 learnable=learnable),
        G.ReLU(),
        G.Conv2d(14, padding=0))


def draw_gp_targets(truth, tr_x, n_functions, seed):
    """Function draws from the truth kernel's GP (scale-normalised
    Cholesky for float conditioning; shared with tests/test_fit.py so the
    demo and the recovery test cannot silently diverge)."""
    k_true = np.asarray(truth(tr_x), np.float64)
    s = np.diagonal(k_true).mean()
    chol = np.linalg.cholesky(k_true / s + 1e-6 * np.eye(len(k_true)))
    rng = np.random.RandomState(seed)
    return (chol @ rng.randn(len(k_true), n_functions)
            * np.sqrt(s)).astype(np.float32)


def main(_):
    tr_x, _, _, _ = synthetic_arrays(n_train=FLAGS.n_train, n_test=0,
                                     shape=(1, 14, 14), seed=FLAGS.seed)
    truth = make_model(FLAGS.vw_true, FLAGS.vb_true)
    y = draw_gp_targets(truth, tr_x, FLAGS.n_functions, FLAGS.seed)

    model = make_model(FLAGS.vw_init, FLAGS.vb_init, learnable=True)
    fitted, losses = fit(model, tr_x, y, steps=FLAGS.steps,
                         learning_rate=FLAGS.learning_rate)
    vw = float(fitted.mods[0].var_weight)
    vb = float(fitted.mods[0].var_bias)
    nmll_truth = float(neg_marginal_log_likelihood(
        make_model(FLAGS.vw_true, FLAGS.vb_true, learnable=True),
        jnp.asarray(tr_x), jnp.asarray(y)))
    print(f"nmll: init {losses[0]:.2f} -> fitted {losses[-1]:.2f} "
          f"(truth {nmll_truth:.2f})")
    print(f"var_weight: init {FLAGS.vw_init} -> {vw:.3f} "
          f"(truth {FLAGS.vw_true})")
    print(f"var_bias:   init {FLAGS.vb_init} -> {vb:.3f} "
          f"(truth {FLAGS.vb_true})")


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_integer("n_train", 64, "training examples")
    f.DEFINE_integer("n_functions", 8, "target function draws")
    f.DEFINE_integer("steps", 80, "optimisation steps")
    f.DEFINE_float("learning_rate", 0.1, "adam learning rate")
    f.DEFINE_float("vw_true", 3.0, "generating var_weight")
    f.DEFINE_float("vb_true", 1.5, "generating var_bias")
    f.DEFINE_float("vw_init", 1.0, "initial var_weight")
    f.DEFINE_float("vb_init", 0.5, "initial var_bias")
    f.DEFINE_integer("seed", 3, "rng seed")
    absl.app.run(main)
