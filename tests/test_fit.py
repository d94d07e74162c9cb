"""Kernel hyperparameter learning tests: gradients flow through Mixture
logits and marginal-likelihood fitting moves them the right way."""

import jax
import numpy as np

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.fit import fit, neg_marginal_log_likelihood
from cnn_gp_tpu.ops import solve


def _mixture_model():
    # branch 0: informative ConvNet kernel; branch 1: near-degenerate
    # 1x1-readout kernel.  A good fit should upweight branch 0.
    good = G.Sequential(G.Conv2d(5, var_weight=2.0), G.ReLU(),
                        G.Conv2d(14, padding=0))
    weak = G.Sequential(G.Conv2d(14, padding=0, var_weight=1e-3,
                                 var_bias=1.0))
    return G.Mixture([good, weak])


def test_nmll_finite_and_differentiable():
    model = _mixture_model()
    tr_x, tr_y, _, _ = synthetic_arrays(n_train=32, n_test=0,
                                        shape=(1, 14, 14))
    y = solve.one_hot_targets(tr_y, dtype=np.float32)
    loss = neg_marginal_log_likelihood(model, tr_x, y)
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda m: neg_marginal_log_likelihood(m, tr_x, y))(model)
    g = np.asarray(grads.logit)
    assert g.shape == (2,) and np.isfinite(g).all() and (g != 0).any()


def test_fit_recovers_generating_branch():
    """Targets drawn from branch 0's GP: marginal likelihood must
    upweight branch 0."""
    model = _mixture_model()
    tr_x, _, _, _ = synthetic_arrays(n_train=48, n_test=0,
                                     shape=(1, 14, 14), seed=7)
    k0 = np.asarray(model.mods[0](tr_x), np.float64)
    k0 /= np.diagonal(k0).mean()
    chol = np.linalg.cholesky(k0 + 1e-6 * np.eye(len(k0)))
    rng = np.random.RandomState(0)
    y = (chol @ rng.randn(len(k0), 4)).astype(np.float32)
    fitted, losses = fit(model, tr_x, y, steps=30, learning_rate=0.2)
    assert losses[-1] < losses[0], losses
    w = np.asarray(jax.nn.softmax(fitted.logit))
    assert w[0] > 0.6, w  # generating branch upweighted
