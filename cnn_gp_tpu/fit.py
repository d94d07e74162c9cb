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

Two NMLL paths with different scale ceilings:

* ``neg_marginal_log_likelihood`` / ``fit`` — ONE jitted program that
  materialises the full Gram and differentiates through a whole-matrix
  float32 ``jnp.linalg.cholesky``.  The [N^2, W, H] covariance
  intermediates of a single un-tiled kernel evaluation cap this at
  ~N<=512 on a 16 GB chip for 28x28 inputs (the program OOMs long
  before the remote-compile payload limits that kill whole-matrix
  programs at 16k^2 — BASELINE.md "Memory/runtime design rules").
  Use for toy problems and as the oracle in tests.
* ``nmll_value_and_grad_tiled`` / ``fit_large`` — the scalable path:
  the Gram is assembled by the bounded tile sweeps of
  ``parallel.gram`` (device, float32), the O(N^3) factor/inverse and
  the NMLL value run on host in float64 (exact at the f32-Gram's own
  accuracy), and the gradient is EXACT via the evidence identity
  ``dL/dK = 0.5 (C K^{-1} - A A^T)`` contracted tile-by-tile with
  kernel VJPs on device — bounded programs throughout, nothing
  whole-matrix ever jitted.  Practical ceiling is the host-side O(N^2)
  float64 algebra (~16k on this 1-core host: a ~100 s Cholesky+inverse
  per step); the device legs scale like ordinary Gram assembly.
  Measured at N=2048 on the paper ConvNet GP (BASELINE.md "Type-II ML
  at scale").
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import apply_kernel

__all__ = ["neg_marginal_log_likelihood", "fit",
           "nmll_value_and_grad_tiled", "fit_large"]


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


@functools.partial(jax.jit, static_argnames=("b", "n", "snap"))
def _grad_chunk_jit(grad, model, x_all, offsets, cotangents, b, n, snap):
    """One bounded chunk of Gram-tile VJPs: for each manifest row
    ``(i0, j0, w)`` regenerate the [b, b] kernel tile (same global-index
    diagonal masking as assembly, `parallel.gram._tile_body`) and
    accumulate ``w * <cotangent, dK_tile/dtheta>`` into the (tiny)
    model-gradient pytree.  ``w`` is 2 for strictly-upper tiles (the
    mirror tile's contribution, by symmetry of both K and the cotangent),
    1 on the diagonal, 0 for chunk padding.

    The diag mask is widened to EVERY entry touching a pad row/col
    (global index >= n): pad rows repeat real examples, and a duplicate
    pair sits at cos(theta) = 1 where the ReLU transform's local
    jacobian is infinite — a zero cotangent does not neutralise an
    infinite local derivative (0 * inf = NaN poisons the whole summed
    leaf gradient).  The grad-safe double-where keyed on this mask feeds
    the discarded entries a neutral input; their primal values are
    irrelevant (zero cotangent)."""
    del snap

    def body(g, inp):
        off, ct = inp
        i0, j0 = off[0], off[1]
        w = off[2].astype(jnp.float32)

        def tile(m):
            xi = jax.lax.dynamic_slice_in_dim(x_all, i0, b)
            xj = jax.lax.dynamic_slice_in_dim(x_all, j0, b)
            rows = i0 + jnp.arange(b)
            cols = j0 + jnp.arange(b)
            mask = ((rows[:, None] == cols[None, :])
                    | (rows >= n)[:, None] | (cols >= n)[None, :])
            return apply_kernel(m, xi, xj, False, False, mask)

        _, vjp = jax.vjp(tile, model)
        (gm,) = vjp(w * ct)
        return jax.tree_util.tree_map(jnp.add, g, gm), None

    return jax.lax.scan(body, grad, (offsets, cotangents))[0]


def nmll_value_and_grad_tiled(model, x, y: np.ndarray, jitter: float = 1e-6,
                              batch_size: int = 128,
                              tiles_per_call: int = 256):
    """Exact NMLL value and gradient at N beyond the whole-matrix path.

    Same objective and jitter convention as
    :func:`neg_marginal_log_likelihood` — the NMLL of ``K + s*jitter*I``
    with ``s = mean(diag K)`` treated as a constant — but structured for
    scale (see the module docstring): the Gram is assembled by bounded
    device tile sweeps, the value comes from a host float64
    Cholesky, and the gradient is exact via
    ``dL/dK = 0.5 (C K^{-1} - A A^T)`` (A the [N, C] solve), contracted
    with per-tile kernel VJPs on device over the upper-triangle manifest
    (strictly-upper cotangent tiles weighted 2 — K and dL/dK are both
    symmetric).  Returns ``(loss, grad_pytree)`` with the gradient in the
    model's own (primal) leaves; float64 value, float32-accumulated
    gradient.

    The reference has no hyperparameter optimisation at all — its
    7.86/2.79 come from the paper's random search (reference:
    configs/mnist_paper_convnet_gp.py:16-30, cnn_gp/kernels.py:61-76).
    """
    import scipy.linalg

    from . import settings
    from .parallel.device_large import _chunk_weighted
    from .parallel.gram import _pad_to_multiple, gram_in_memory

    x = np.asarray(x, np.float32)
    y64 = np.asarray(y, np.float64)
    n, c = len(x), y64.shape[1]
    b = min(batch_size, n)

    # 1) K: bounded device tile sweeps, host float64 copy (O(N^2) host —
    # the documented ceiling of this path)
    k = np.asarray(gram_in_memory(model, x, batch_size=b, progress=False),
                   np.float64)
    s = float(np.mean(np.diagonal(k)))
    k.flat[:: n + 1] += s * jitter

    # 2) value + dL/dK in float64 on host: alpha, K^{-1}, logdet from one
    # Cholesky (same O(N^3) class as the solve the fitted kernel feeds)
    cho = scipy.linalg.cho_factor(k, lower=True)
    alpha = scipy.linalg.cho_solve(cho, y64)
    loss = (0.5 * float(np.sum(y64 * alpha))
            + c * float(np.sum(np.log(np.diagonal(cho[0])))))
    kinv, info = scipy.linalg.lapack.dpotri(cho[0], lower=True)
    if info != 0:
        raise np.linalg.LinAlgError(f"dpotri failed: info={info}")
    kinv = np.tril(kinv) + np.tril(kinv, -1).T
    gbar = 0.5 * (c * kinv - alpha @ alpha.T)      # symmetric [n, n]

    # 3) exact gradient: tile VJPs against gbar over the upper triangle.
    # Pad with REAL rows (cyclic), not zeros: constant (e.g. zero) pad
    # images become perfectly correlated pairs after the first conv's
    # +var_bias and NaN the backward pass even under the widened mask
    # heuristics; cyclic pads are ordinary images whose duplicate-pair
    # degeneracy the widened diag mask in `_grad_chunk_jit` neutralises.
    m_pad = -(-n // b) * b
    x_all = jax.device_put(x[np.arange(m_pad) % n])
    nt = m_pad // b
    offs = np.asarray([(i * b, j * b, 1 if i == j else 2)
                       for i in range(nt) for j in range(i, nt)], np.int32)
    gpad = np.zeros((m_pad, m_pad), np.float32)
    gpad[:n, :n] = gbar                       # pad rows contribute nothing
    grad = jax.tree_util.tree_map(jnp.zeros_like, model)
    with settings.override(grad_safe=True):
        snap = settings.snapshot()
        with jax.default_matmul_precision("highest"):
            for chunk in _chunk_weighted(offs[:, :2], tiles_per_call):
                # _chunk_weighted appends weight 1/0; recover the real
                # weights for non-pad rows from the manifest position
                ct = np.stack([gpad[i0:i0 + b, j0:j0 + b]
                               for i0, j0, _ in chunk])
                w = np.asarray([2 if (wv and i0 != j0) else wv
                                for i0, j0, wv in chunk], np.int32)
                chunk = np.concatenate([chunk[:, :2], w[:, None]], axis=1)
                grad = _grad_chunk_jit(grad, model, x_all,
                                       jnp.asarray(chunk),
                                       jnp.asarray(ct), b, n, snap)
    return loss, jax.tree_util.tree_map(np.asarray, grad)


def fit_large(model, x, y, steps: int = 30, learning_rate: float = 0.1,
              jitter: float = 1e-6, batch_size: int = 128,
              verbose: bool = False) -> Tuple[object, np.ndarray]:
    """Type-II ML at Gram-assembly scale: the `fit` loop driven by
    :func:`nmll_value_and_grad_tiled` instead of the whole-matrix jit.
    Positive leaves are optimised in log space exactly as in :func:`fit`
    (the log-space chain rule is one host-side VJP of the exp transform).
    Each step costs ~2 Gram assemblies on device (forward + tile VJPs)
    plus one host float64 Cholesky.  Returns (fitted_model, losses) with
    the BEST-loss iterate, not the last one — the loss is exact (host
    float64), so keeping the argmin costs nothing and survives late-run
    Adam overshoot (measured at N=2048: the trajectory bottomed at step
    24 of 30 and bounced; BASELINE.md "Type-II ML at scale")."""
    import optax

    opt = optax.adam(learning_rate)
    raw = _to_log_space(model)
    opt_state = opt.init(raw)
    losses = []
    best_raw, best_loss = raw, np.inf
    for it in range(steps):
        primal, vjp_log = jax.vjp(_from_log_space, raw)
        loss, g_primal = nmll_value_and_grad_tiled(
            primal, x, y, jitter=jitter, batch_size=batch_size)
        if loss < best_loss:
            best_raw, best_loss = raw, loss
        (g_raw,) = vjp_log(jax.tree_util.tree_map(
            lambda p, g: jnp.asarray(g, p.dtype), primal, g_primal))
        updates, opt_state = opt.update(g_raw, opt_state)
        raw = optax.apply_updates(raw, updates)
        losses.append(float(loss))
        if verbose:
            print(f"[fit_large] step {it}: nmll {loss:.4f}", flush=True)
    return _from_log_space(best_raw), np.asarray(losses)
