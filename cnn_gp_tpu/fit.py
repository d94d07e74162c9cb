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
* ``ProbedNMLL`` / ``fit_large(grad="probed")`` — the fully
  device-resident path with NO host O(N^2): the equilibrated Gram is
  assembled straight into the blocked sharded factor's buffer
  (``parallel.device_large`` machinery, one [N_pad, N_pad] float32 in
  HBM), the value reads the factor's log-diagonal, and the gradient
  replaces the dense ``C K^{-1}`` cotangent with the Hutchinson
  estimator ``K^{-1} ~ (1/P) sum_p u_p z_p^T`` (u = K^{-1} z through
  the factor), so every tile's cotangent is a rank-(P+C) outer product
  computed on device from two [N, P]-sized matrices.  Unbiased
  (exactness recovered under the scaled-basis probe matrix — see
  ``tests/test_fit.py``); per-step noise ~1/sqrt(P) on the trace term,
  which Adam absorbs.  This is the path past the host ceiling: the
  whole step is Gram-assembly-priced at any N the classify path
  reaches (50k+).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import apply_kernel

__all__ = ["neg_marginal_log_likelihood", "fit",
           "nmll_value_and_grad_tiled", "fit_large", "ProbedNMLL",
           "save_leaves", "load_leaves"]


def save_leaves(model, path: str) -> None:
    """Persist a model's array leaves (e.g. fitted hyperparameters) as an
    .npz keyed by pytree path, so a fit's outcome survives the process —
    the reference hard-codes its hyperparameters in config files
    (reference: configs/mnist_paper_convnet_gp.py:16-30) and has nothing
    to persist.  The architecture itself is NOT saved (it is code — a
    config); :func:`load_leaves` grafts the values onto a freshly built
    model of the same architecture."""
    leaves = jax.tree_util.tree_flatten_with_path(model)[0]
    if not leaves:
        raise ValueError("model has no array leaves to save (construct "
                         "layers with learnable=True)")
    np.savez(path, **{jax.tree_util.keystr(p): np.asarray(v)
                      for p, v in leaves})


def load_leaves(model, path: str):
    """Return a copy of ``model`` with its array leaves replaced by the
    values :func:`save_leaves` wrote.  The model must be built with the
    SAME architecture and learnable flags; any missing/extra/mis-shaped
    leaf is refused (a silent partial load would quietly serve a
    different kernel)."""
    with np.load(path) as data:
        saved = {k: data[k] for k in data.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(model)
    new = []
    for p, v in paths:
        k = jax.tree_util.keystr(p)
        if k not in saved:
            raise ValueError(
                f"{path} has no value for leaf {k}: the saved model's "
                f"architecture/learnable flags differ from this one "
                f"(saved leaves: {sorted(saved)})")
        a = saved.pop(k)
        if a.shape != np.shape(v):
            raise ValueError(f"leaf {k}: saved shape {a.shape} != model "
                             f"shape {np.shape(v)}")
        new.append(jnp.asarray(a, jnp.asarray(v).dtype))
    if saved:
        raise ValueError(
            f"{path} holds leaves this model does not have: "
            f"{sorted(saved)} (architecture/learnable flags differ)")
    return jax.tree_util.tree_unflatten(treedef, new)


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


@functools.partial(jax.jit, donate_argnums=0,
                   static_argnames=("b", "n", "snap"))
def _probed_grad_chunk_jit(grad, model, x_all, offsets, weights, u_all,
                           z_all, a_all, cp, b, n, snap):
    """One bounded chunk of Gram-tile VJPs against the RANK-STRUCTURED
    probed cotangent: for manifest row ``(i0, j0)`` with float weight
    ``w`` the cotangent tile is assembled ON DEVICE from slices of the
    solved probe matrix ``U`` ([m_pad, P], ``u = K'^{-1} z`` in raw
    space, zero pad rows), the probe draws ``Z`` ([m_pad, P]), and the
    solved targets ``A`` ([m_pad, C]):

        ct = 0.5 * (cp * (U_i Z_j^T + Z_i U_j^T) - A_i A_j^T),
        cp = C / (2 P)

    — the Hutchinson estimate of the evidence-identity cotangent
    ``0.5 (C K'^{-1} - A A^T)``, symmetrised so the upper-triangle
    weight-2 contraction stays exact for symmetric dK.  Weights are
    float: tile subsampling rescales the survivors to keep the estimate
    unbiased (``ProbedNMLL`` ``tile_fraction``); chunk padding is
    weight 0.  Nothing O(N^2) is ever materialised or uploaded (the
    exact path ships a [b, b] cotangent per tile from the host —
    ~4.7 GB of upload at 50k).  Same widened diag mask and grad-safe
    semantics as `_grad_chunk_jit`."""
    del snap

    def body(g, inp):
        off, w = inp
        i0, j0 = off[0], off[1]

        def tile(m):
            xi = jax.lax.dynamic_slice_in_dim(x_all, i0, b)
            xj = jax.lax.dynamic_slice_in_dim(x_all, j0, b)
            rows = i0 + jnp.arange(b)
            cols = j0 + jnp.arange(b)
            mask = ((rows[:, None] == cols[None, :])
                    | (rows >= n)[:, None] | (cols >= n)[None, :])
            return apply_kernel(m, xi, xj, False, False, mask)

        ui = jax.lax.dynamic_slice_in_dim(u_all, i0, b)
        uj = jax.lax.dynamic_slice_in_dim(u_all, j0, b)
        zi = jax.lax.dynamic_slice_in_dim(z_all, i0, b)
        zj = jax.lax.dynamic_slice_in_dim(z_all, j0, b)
        ai = jax.lax.dynamic_slice_in_dim(a_all, i0, b)
        aj = jax.lax.dynamic_slice_in_dim(a_all, j0, b)
        ct = 0.5 * (cp * (ui @ zj.T + zi @ uj.T) - ai @ aj.T)
        _, vjp = jax.vjp(tile, model)
        (gm,) = vjp(w * ct)
        return jax.tree_util.tree_map(jnp.add, g, gm), None

    return jax.lax.scan(body, grad, (offsets, weights))[0]


def _weighted_chunks(offs: np.ndarray, w: np.ndarray, c: int):
    """Fixed-size chunks of an (offsets [T, 2] int32, weights [T]
    float32) manifest, tail padded with weight-0 repeats so ONE compiled
    program serves every chunk."""
    c = min(c, len(offs))
    for r0 in range(0, len(offs), c):
        oc, wc = offs[r0:r0 + c], w[r0:r0 + c]
        if len(oc) < c:
            pad = c - len(oc)
            oc = np.concatenate([oc, np.repeat(oc[-1:], pad, axis=0)])
            wc = np.concatenate([wc, np.zeros(pad, np.float32)])
        yield oc, wc


class ProbedNMLL:
    """Reusable device-resident NMLL value+gradient for one training set:
    construct once, call :meth:`value_and_grad` once per optimisation
    step (`fit_large(grad="probed")` does exactly this).  All compiled
    programs — assembly chunks, the blocked factor step, solvers, the
    VJP chunks — are built on the first step and reused; the padded
    training set is uploaded once.

    Same objective and jitter convention as
    :func:`nmll_value_and_grad_tiled` (the NMLL of ``K + s_bar*jitter*I``
    with ``s_bar = mean(diag K)`` treated as constant); the value's
    log-determinant reads the float32 factor's diagonal
    (`chol_dist._ShardedFactor.log_diag_sum`, equilibration-corrected)
    and the quadratic form reuses the refined solve, exactly like the
    classify path's evidence.  The gradient's dense-trace cotangent is
    replaced by the Hutchinson estimator with ``probes`` Rademacher
    draws — unbiased, per-step standard error ~1/sqrt(P) on the trace
    term (stochastic-trace estimation is the standard scalable-GP
    device, e.g. Gardner et al. 2018, GPyTorch).  A fresh seed per step
    gives independent draws, so the optimiser sees unbiased gradients
    throughout.

    ``tile_fraction < 1`` subsamples the strictly-upper tile manifest
    per step so the VJP sweep — measured 59% of a warm 16k step — costs
    only that fraction.  The sample is IMPORTANCE-weighted: tiles are
    drawn with replacement proportionally to a free upper bound on each
    tile's cotangent Frobenius norm (products of block-row norms of U,
    Z, A) and each draw weighted by 2/(k p) — unbiased, with variance
    concentrated where the cotangent mass is.  This matters: uniform
    subsampling is unbiased too but its variance measurably FLIPPED the
    gradient direction at 50k on the hard task (the per-leaf gradient
    is a small difference of large cancelling tile sums; BASELINE.md
    "Type-II ML past the host ceiling").  Diagonal tiles are always
    swept (they carry the jitter-dominated diagonal mass).
    ``refine_iters=0`` drops the solve's residual sweep too (another
    ~23% at 16k) — the loss's quadratic term then carries the raw
    float32-factor solve error, far below per-step probe noise (at 50k
    the refined and unrefined traces measured identical to 4 decimals).

    The reference has no hyperparameter optimisation at all; this path
    exists so type-II ML runs at the same N the device classify path
    reaches, past the host-float64 ceiling of the exact tiled path
    (reference anchor: the random-searched constants in
    configs/mnist_paper_convnet_gp.py:16-30)."""

    def __init__(self, x, y, *, jitter: float = 1e-6,
                 batch_size: int = 128, block: int = 1024,
                 probes: int = 16, mesh=None, refine_iters: int = 1,
                 tiles_per_call: int = 256, tile_fraction: float = 1.0):
        from .parallel.chol_dist import _ShardedFactor
        from .parallel.mesh import make_mesh
        from .parallel import device_large as dl

        if mesh is None:
            mesh = make_mesh()
        x32 = np.asarray(x, np.float32)
        self.n = n = len(x32)
        self.b = b = min(batch_size, n)
        self.jitter = jitter
        self.probes = probes
        self.refine_iters = refine_iters
        self.tiles_per_call = tiles_per_call
        if not 0.0 < tile_fraction <= 1.0:
            raise ValueError(f"tile_fraction must be in (0, 1], got "
                             f"{tile_fraction}")
        self.tile_fraction = tile_fraction
        self.mesh = mesh
        self.factor = _ShardedFactor(mesh, n, block, pad_to=b)
        self.m_pad = m_pad = -(-n // b) * b
        if m_pad > self.factor.n_pad:   # not assert: stripped under -O,
            # and a violation would index assembly/VJP offsets past the
            # factor buffer and corrupt results silently
            raise ValueError(f"batch padding {m_pad} exceeds factor "
                             f"n_pad {self.factor.n_pad}")
        # cyclic padding, not zeros: pad rows must be ordinary images for
        # the backward pass (see nmll_value_and_grad_tiled's pad note)
        self.x_all = jnp.asarray(x32[np.arange(m_pad) % n])
        self.y64 = np.asarray(y, np.float64)
        self.diag_offs = jnp.asarray(np.arange(0, m_pad, b, dtype=np.int32))
        self.lower_offs = dl._lower_offsets(n, b)
        self.upper_offs = dl._upper_offsets(n, b)
        nt = m_pad // b
        # split manifest: diagonal tiles are ALWAYS swept (weight 1);
        # strictly-upper tiles (weight 2) are the subsampling pool
        self.diag_tiles = np.asarray(
            [(i * b, i * b) for i in range(nt)], np.int32)
        self.off_tiles = np.asarray(
            [(i * b, j * b) for i in range(nt)
             for j in range(i + 1, nt)], np.int32).reshape(-1, 2)
        # measured-floor tolerance for the refinement residual, as in
        # classify_device_large
        self.tol = 3.0 * np.sqrt(n) * float(np.finfo(np.float32).eps)
        # per-phase wall seconds of the last value_and_grad call
        self.last_phases = {}

    def value_and_grad(self, model, seed: int = 0,
                       _probe_matrix: Optional[np.ndarray] = None):
        """One step's (loss, grad_pytree).  ``_probe_matrix`` [n, P]
        overrides the Rademacher draw (tests: ``sqrt(n) * I`` makes the
        Hutchinson estimator EXACT, recovering the tiled path's gradient
        bit-for-bit-at-float32)."""
        from . import settings
        from .parallel import device_large as dl

        n, b, m_pad = self.n, self.b, self.m_pad
        snap = settings.snapshot()
        phases = self.last_phases = {}
        _t = [time.perf_counter()]

        def _tick(name):
            now = time.perf_counter()
            phases[name] = round(now - _t[0], 2)
            _t[0] = now

        # 1) diagonal -> jitter scale + Jacobi equilibration
        diag = np.asarray(dl._diag_scan_jit(
            model, self.x_all, self.diag_offs, b, n, m_pad, snap),
            np.float64)[:n]
        jitter_raw = self.jitter * float(np.mean(diag))
        s64 = 1.0 / np.sqrt(diag + jitter_raw)
        s_pad = np.ones(self.factor.n_pad, np.float32)
        s_pad[:n] = s64
        s_dev = jnp.asarray(s_pad[:m_pad])
        _tick("diag")

        # 2) scaled Gram assembled straight into the factor buffer.
        # Free the PREVIOUS step's factor first: two [n_pad, n_pad]
        # residents is an instant OOM at 50k on a 16 GB chip.
        self.factor.l_loc = None
        self.factor.diags = None
        k = dl._assemble_scaled(model, self.x_all, jnp.asarray(s_pad),
                                self.lower_offs, b, n, self.factor.n_pad,
                                self.mesh)
        k.block_until_ready()
        _tick("assemble")
        self.factor._factorize_dev(k)
        del k
        jax.block_until_ready(self.factor.l_loc)
        _tick("factor")

        # 3) targets and probes through ONE batched solve (+ bounded IR:
        # each residual is a tile-regeneration matvec sweep)
        c_cls = self.y64.shape[1]
        if _probe_matrix is not None:
            z = np.asarray(_probe_matrix, np.float64)
            p = z.shape[1]
        else:
            rng = np.random.default_rng(seed)
            p = self.probes
            z = (rng.integers(0, 2, size=(n, p)) * 2.0 - 1.0)
        rhs = np.concatenate([self.y64, z], axis=1)
        rs = s64[:, None] * rhs
        rnorm = np.linalg.norm(rs, axis=0)
        rnorm[rnorm == 0] = 1.0

        def matvec(a64):
            a_f32 = np.zeros((m_pad, a64.shape[1]), np.float32)
            a_f32[:n] = a64
            out = dl._matvec_scan(model, self.x_all, s_dev,
                                  self.upper_offs, jnp.asarray(a_f32),
                                  b, n, snap)
            return np.asarray(out, np.float64)[:n]

        with jax.default_matmul_precision("highest"):
            a_s = self.factor.solve(rs.astype(np.float32)).astype(
                np.float64)
            for _ in range(self.refine_iters):
                r = rs - matvec(a_s)
                if float(np.max(np.linalg.norm(r, axis=0)
                                / rnorm)) <= self.tol:
                    break
                a_s = a_s + self.factor.solve(
                    r.astype(np.float32)).astype(np.float64)

        _tick("solve")
        a_raw = s64[:, None] * a_s                     # K'^{-1} [y | z]
        alpha, u = a_raw[:, :c_cls], a_raw[:, c_cls:]

        # 4) value: quadratic form + factor log-determinant
        loss = (0.5 * float(np.sum(self.y64 * alpha))
                + c_cls * (self.factor.log_diag_sum()
                           - float(np.sum(np.log(s64)))))

        # 5) gradient: rank-structured cotangents against tile VJPs
        u_dev = jnp.asarray(np.concatenate(
            [u, np.zeros((m_pad - n, p))]).astype(np.float32))
        z_dev = jnp.asarray(np.concatenate(
            [z, np.zeros((m_pad - n, p))]).astype(np.float32))
        a_dev = jnp.asarray(np.concatenate(
            [alpha, np.zeros((m_pad - n, c_cls))]).astype(np.float32))
        cp_f = c_cls / (2.0 * p)
        cp = jnp.float32(cp_f)
        # tile manifest for this step: all diagonal tiles (weight 1) +
        # either every strictly-upper tile (weight 2) or an
        # IMPORTANCE-SAMPLED subset.  Uniform subsampling is NOT safe
        # here: the per-leaf gradient is a small difference of large
        # cancelling tile sums (trace term vs alpha term), and on the
        # hard 50k task uniform f=0.25 sampling measurably flipped its
        # sign (BASELINE.md).  Instead sample WITH replacement
        # proportionally to a per-tile upper bound on the cotangent's
        # Frobenius norm — computable for free from block-row norms of
        # U, Z, A — and weight each draw by 2/(k p): unbiased, with the
        # variance concentrated sampling actually prices.
        off, n_off = self.off_tiles, len(self.off_tiles)
        if self.tile_fraction < 1.0 and n_off > 1:
            def block_norms(m):           # [nt] Frobenius norm per row block
                mp = np.concatenate([m, np.zeros((m_pad - n, m.shape[1]))])
                return np.linalg.norm(
                    mp.reshape(m_pad // b, b, -1), axis=(1, 2))

            bu, bz, ba = block_norms(u), block_norms(z), block_norms(alpha)
            ii = self.off_tiles[:, 0] // b
            jj = self.off_tiles[:, 1] // b
            bound = (cp_f * (bu[ii] * bz[jj] + bz[ii] * bu[jj])
                     + ba[ii] * ba[jj])
            prob = bound / bound.sum() if bound.sum() > 0 else (
                np.full(n_off, 1.0 / n_off))
            k_t = max(1, int(round(self.tile_fraction * n_off)))
            sel = np.random.default_rng((seed, 1)).choice(
                n_off, size=k_t, replace=True, p=prob)
            off = off[sel]
            w_off = (2.0 / (k_t * prob[sel])).astype(np.float32)
        else:
            w_off = np.full(len(off), 2.0, np.float32)
        offs = np.concatenate([self.diag_tiles, off])
        ws = np.concatenate([np.ones(len(self.diag_tiles), np.float32),
                             w_off])
        grad = jax.tree_util.tree_map(jnp.zeros_like, model)
        with settings.override(grad_safe=True):
            gsnap = settings.snapshot()
            with jax.default_matmul_precision("highest"):
                for oc, wc in _weighted_chunks(offs, ws,
                                               self.tiles_per_call):
                    grad = _probed_grad_chunk_jit(
                        grad, model, self.x_all, jnp.asarray(oc),
                        jnp.asarray(wc), u_dev, z_dev, a_dev, cp, b, n,
                        gsnap)
        out = jax.tree_util.tree_map(np.asarray, grad)
        _tick("grad_vjp")
        return loss, out


def fit_large(model, x, y, steps: int = 30, learning_rate: float = None,
              jitter: float = 1e-6, batch_size: int = 128,
              verbose: bool = False, grad: str = "exact",
              probes: int = 16, block: int = 1024, mesh=None,
              seed: int = 0, tile_fraction: float = 1.0,
              refine_iters: int = 1, backtrack: bool = True,
              backtrack_factor: float = 0.5,
              backtrack_tol: float = 1e-3,
              min_learning_rate: float = 1e-3) -> Tuple[object, np.ndarray]:
    """Type-II ML at Gram-assembly scale: the `fit` loop driven by
    :func:`nmll_value_and_grad_tiled` instead of the whole-matrix jit.
    Positive leaves are optimised in log space exactly as in :func:`fit`
    (the log-space chain rule is one host-side VJP of the exp transform).
    Each step costs ~2 Gram assemblies on device (forward + tile VJPs)
    plus one host float64 Cholesky.  Returns (fitted_model, losses) with
    the BEST-loss iterate, not the last one — the loss is exact (host
    float64), so keeping the argmin costs nothing and survives late-run
    Adam overshoot (measured at N=2048: the trajectory bottomed at step
    24 of 30 and bounced; BASELINE.md "Type-II ML at scale").

    ``grad="probed"`` switches to the fully device-resident
    :class:`ProbedNMLL` path (Hutchinson-trace cotangents through the
    blocked device factor, ``probes`` draws, fresh seed per step) — use
    it past the exact path's host-float64 ceiling (~16k on a 1-core
    host) or whenever the host O(N^3) per step dominates; the best-loss
    iterate logic still applies (the value term is solver-exact, only
    the gradient is stochastic).

    **Overshoot guard** (on by default): because the loss value is
    solver-exact even when the gradient is stochastic, a step that RAISES
    the NMLL more than ``backtrack_tol * |best|`` above the best seen is
    rejected — the iterate restarts from the best one, the Adam state is
    reset, and the learning rate is multiplied by ``backtrack_factor``
    (floored at ``min_learning_rate``).  This is the engineered fix for
    the measured lr=0.1 one-step overshoot of the subsampled probed
    gradient at 4k-50k (BASELINE.md "Fit small, deploy at 50k", round 4):
    a rejected step costs one step of budget, never a worse model.
    ``learning_rate=None`` resolves to 0.1 for exact gradients and 0.05
    for probed ones (the stochastic path needs the guard to engage
    before Adam's momentum compounds a bad first step).
    """
    import optax

    if grad not in ("exact", "probed"):
        raise ValueError(f"grad must be 'exact' or 'probed', got {grad!r}")
    if learning_rate is None:
        learning_rate = 0.1 if grad == "exact" else 0.05
    plan = None
    if grad == "probed":
        plan = ProbedNMLL(x, y, jitter=jitter, batch_size=batch_size,
                          block=block, probes=probes, mesh=mesh,
                          tile_fraction=tile_fraction,
                          refine_iters=refine_iters)

    lr = float(learning_rate)
    opt = optax.adam(lr)
    raw = _to_log_space(model)
    opt_state = opt.init(raw)
    losses = []
    best_raw, best_loss = raw, np.inf
    for it in range(steps):
        t0 = time.perf_counter()
        primal, vjp_log = jax.vjp(_from_log_space, raw)
        if plan is not None:
            loss, g_primal = plan.value_and_grad(primal, seed=seed + it)
        else:
            loss, g_primal = nmll_value_and_grad_tiled(
                primal, x, y, jitter=jitter, batch_size=batch_size)
        losses.append(float(loss))
        if loss < best_loss:
            best_raw, best_loss = raw, loss
        rejected = backtrack and (
            not np.isfinite(loss)
            or loss > best_loss + backtrack_tol * abs(best_loss))
        if rejected:
            # discard this iterate AND its gradient (measured at a bad
            # point); restart from the best iterate at a smaller step
            lr = max(lr * backtrack_factor, min_learning_rate)
            opt = optax.adam(lr)
            raw = best_raw
            opt_state = opt.init(raw)
            if verbose:
                print(f"[fit_large] step {it}: nmll {loss:.4f} REJECTED "
                      f"(best {best_loss:.4f}); lr -> {lr:.4g}",
                      flush=True)
            continue
        (g_raw,) = vjp_log(jax.tree_util.tree_map(
            lambda p, g: jnp.asarray(g, p.dtype), primal, g_primal))
        updates, opt_state = opt.update(g_raw, opt_state)
        raw = optax.apply_updates(raw, updates)
        if verbose:
            extra = f"  {plan.last_phases}" if plan is not None else ""
            print(f"[fit_large] step {it}: nmll {loss:.4f} lr {lr:.4g} "
                  f"({time.perf_counter() - t0:.1f}s){extra}", flush=True)
    return _from_log_space(best_raw), np.asarray(losses)
