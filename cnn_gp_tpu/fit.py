"""Kernel hyperparameter learning.

The reference exposes exactly one trainable parameter -- ``Mixture.logit``
(reference: cnn_gp/kernels.py:212-219) -- but ships no code that optimises
it.  Because our layers are pytrees whose leaves are ordinary JAX arrays,
the whole kernel is differentiable end to end; this module supplies the
missing training loop: type-II maximum likelihood (marginal-likelihood
maximisation) with optax.

    model, losses = fit(model, x, y_onehot, steps=100)

Only array leaves (e.g. every Mixture's logits) receive gradients; the
static architecture is untouched.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import apply_kernel

__all__ = ["neg_marginal_log_likelihood", "fit"]


def neg_marginal_log_likelihood(model, x: jax.Array, y: jax.Array,
                                jitter: float = 1e-6) -> jax.Array:
    """Negative GP marginal log-likelihood of targets ``y`` [N, C] under
    the model's kernel on inputs ``x`` [N, C, W, H] (per-target-dim sum,
    constants dropped).  Differentiable in the model's array leaves."""
    from . import settings
    with settings.override(grad_safe=True):
        # finite gradients through the ReLU transform's masked diagonal
        # (see settings.grad_safe); primal values are unchanged
        k = apply_kernel(model, x, x, True, False)
    # Scale-normalise for float32 conditioning (paper kernels reach ~1e12)
    # -- with the scale *detached*, so the objective keeps its gradient
    # with respect to the overall kernel scale.  Up to the n*log(s)
    # constant this is the exact NMLL of K with effective jitter s*jitter.
    s = jax.lax.stop_gradient(jnp.mean(jnp.diagonal(k)))
    k = k / s + jitter * jnp.eye(k.shape[0], dtype=k.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    logdet = (2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
              + k.shape[0] * jnp.log(s))
    return 0.5 * jnp.sum(y * alpha) / s + 0.5 * y.shape[1] * logdet


# Leaves that must stay strictly positive (variance hyperparameters of
# Conv2d(learnable=True)): optimised in log space, so an unconstrained
# Adam step can never drive them negative and un-PSD the kernel.
_POSITIVE_LEAVES = frozenset(("var_weight", "var_bias"))
# Exact zero (Conv2d's var_bias default) has no log; floor it at a value
# negligible against any kernel scale so the leaf stays optimisable.
_POSITIVE_FLOOR = 1e-12


def _is_positive_path(path) -> bool:
    k = path[-1] if path else None
    return (isinstance(k, jax.tree_util.GetAttrKey)
            and k.name in _POSITIVE_LEAVES)


def _to_log_space(model):
    return jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.log(jnp.maximum(v, _POSITIVE_FLOOR))
        if _is_positive_path(p) else v, model)


def _from_log_space(raw):
    return jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.exp(v) if _is_positive_path(p) else v, raw)


def fit(model, x, y, steps: int = 50, learning_rate: float = 0.1,
        jitter: float = 1e-6,
        loss_fn: Optional[Callable] = None) -> Tuple[object, np.ndarray]:
    """Optimise the model's array leaves (e.g. Mixture logits, learnable
    Conv2d variances) by gradient descent on the marginal likelihood.
    Returns (fitted_model, losses).

    Positive-only leaves (``var_weight``/``var_bias``) are optimised in
    log space — multiplicative Adam steps that cannot cross zero; an
    unconstrained step on the raw values could make the kernel non-PSD
    and collapse the whole fit to NaN."""
    import optax

    if loss_fn is None:
        loss_fn = functools.partial(neg_marginal_log_likelihood,
                                    x=jnp.asarray(x, jnp.float32),
                                    y=jnp.asarray(y, jnp.float32),
                                    jitter=jitter)
    opt = optax.adam(learning_rate)

    @jax.jit
    def step(raw, opt_state):
        loss, grads = jax.value_and_grad(
            lambda r: loss_fn(_from_log_space(r)))(raw)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(raw, updates), opt_state, loss

    raw = _to_log_space(model)
    opt_state = opt.init(raw)
    losses = []
    for _ in range(steps):
        raw, opt_state, loss = step(raw, opt_state)
        losses.append(float(loss))
    return _from_log_space(raw), np.asarray(losses)
