"""GP classification solvers: Kxx^-1 Y and accuracy reporting.

Rebuild of the reference's CPU LAPACK path (reference:
exp_mnist_resnet/classify_gp.py:17-42): targets are +-1 one-hot, the train
Gram gets ``jitter`` added to its diagonal, ``A = Kxx^-1 Y`` is solved once,
and predictions are ``argmax(Kzx @ A)``.

The reference stores only the upper triangle of Kxx and leans on
``scipy.linalg.solve(assume_a='pos', lower=False)`` reading just that
triangle (reference: cnn_gp/data.py:22-29 + classify_gp.py:24-27).  We make
that contract explicit: ``symmetrize_from_upper`` mirrors the triangle
(NaN-aware, so reference-written files work too), then any solver applies.

Methods:

* ``scipy``  -- float64 LAPACK ``posv`` on host; bit-parity with the
  reference.  Requires float64 inputs for conditioning, as the reference
  asserts (classify_gp.py:19-23).
* ``chol``   -- ``jax.scipy`` Cholesky on the default backend in a chosen
  dtype (float64 needs x64 / CPU).
* ``chol_ir`` -- TPU-native large-N path: float32 Cholesky factorisation on
  device (the O(N^3) part at MXU speed) + a few rounds of iterative
  refinement with float64 residuals on host (the O(N^2) part), recovering
  float64-quality solutions without float64 device math.
* ``chol_dist`` -- the mesh-distributed blocked Cholesky + triangular
  solves (parallel/chol_dist.py): row-sharded factorisation in bounded-size
  device programs, Jacobi equilibration for the ~1e12 NNGP diagonal scale,
  float64 host refinement.  Scales past one chip and past the
  remote-compile limits that cap ``chol_ir``; executed multi-controller on
  a real 2-process ``jax.distributed`` fleet with scipy-identical
  predictions (tests/_fleet_solve_worker.py — host legs fetch only
  replicated outputs, so no shard is read across processes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["one_hot_targets", "diag_add", "symmetrize_from_upper",
           "solve_gp_stats",
           "solve_gp", "predict", "accuracy", "classify",
           "refine_with_factor", "predictive_variance",
           "log_marginal_likelihood", "gaussian_lpd",
           "log_predictive_density"]


def one_hot_targets(labels: np.ndarray, n_classes: Optional[int] = None,
                    dtype=np.float64) -> np.ndarray:
    """+-1 one-hot targets (reference: classify_gp.py:56-59)."""
    labels = np.asarray(labels)
    if n_classes is None:
        n_classes = int(labels.max()) + 1
    y = -np.ones((len(labels), n_classes), dtype=dtype)
    y[np.arange(len(labels)), labels] = 1.0
    return y


def diag_add(k: np.ndarray, jitter: float) -> None:
    """In-place diagonal jitter (reference: classify_gp.py:30-36)."""
    k.flat[:: k.shape[-1] + 1] += jitter


def symmetrize_from_upper(k: np.ndarray, block: int = 4096) -> np.ndarray:
    """Mirror the upper triangle into the lower (in place, NaN-aware).

    Works both for our assembly output and for reference-written H5 files
    whose lower triangle is NaN fill.  Blockwise: ``np.triu_indices(N)``
    would allocate two O(N^2) int64 index arrays (40 GB at N=50k).
    """
    n = k.shape[0]
    iu_full = np.triu_indices(min(block, n), 1)   # shared by all full
    for i0 in range(0, n, block):                 # blocks (~134 MB of
        i1 = min(i0 + block, n)                   # int64 at block=4096 —
        iu = (iu_full if i1 - i0 == min(block, n)  # not rebuilt per block)
              else np.triu_indices(i1 - i0, 1))
        diag_blk = k[i0:i1, i0:i1]
        diag_blk[iu[1], iu[0]] = diag_blk[iu]
        for j0 in range(i1, n, block):
            j1 = min(j0 + block, n)
            k[j0:j1, i0:i1] = k[i0:i1, j0:j1].T
    return k


def _solve_scipy(kxx: np.ndarray, y: np.ndarray) -> np.ndarray:
    import scipy.linalg
    assert kxx.dtype == np.float64 and y.dtype == np.float64, (
        "Kxx and Y must be float64 for the inversion, even if they were "
        "float32 when computed; this makes the solve far less likely to "
        "fail as singular (reference: classify_gp.py:19-23)")
    return scipy.linalg.solve(kxx, y, overwrite_a=True, overwrite_b=False,
                              check_finite=False, assume_a="pos",
                              lower=False)


def _solve_chol(kxx: np.ndarray, y: np.ndarray, dtype) -> np.ndarray:
    kxx_d = jnp.asarray(kxx, dtype)
    y_d = jnp.asarray(y, dtype)
    factor = jax.scipy.linalg.cho_factor(kxx_d, lower=True)
    return np.asarray(jax.scipy.linalg.cho_solve(factor, y_d))


@jax.jit
def _chol32(k32):
    return jax.scipy.linalg.cho_factor(k32, lower=True)[0]


@jax.jit
def _cho_solve32(chol, rhs32):
    return jax.scipy.linalg.cho_solve((chol, True), rhs32)


def refine_with_factor(chol, kxx64: np.ndarray, y: np.ndarray,
                       iters: int = 3) -> np.ndarray:
    """Iteratively refine against a device-resident float32 Cholesky
    factor: float64 residuals on host, correction solves on device.

    The factor is threaded as a jit *argument*, never a closure constant:
    a closed-over device array is baked into the compiled program as a
    literal, which bloats (and on remote-compile runtimes, breaks) the
    compile payload at large N.
    """
    y64 = np.asarray(y, np.float64)
    a = np.asarray(_cho_solve32(chol, jnp.asarray(y, jnp.float32)),
                   np.float64)
    if not np.all(np.isfinite(a)):
        # lax cholesky returns NaNs silently on a non-PD (or
        # float32-rounded barely-PD) matrix; argmaxing NaN scores would
        # then report ~chance accuracy that looks like a modeling result
        raise np.linalg.LinAlgError(
            "float32 Cholesky of the Gram produced non-finite solutions "
            "(matrix not positive-definite at float32?); add jitter or "
            "use method='scipy'")
    for _ in range(iters):
        r = y64 - kxx64 @ a                     # float64 residual on host
        da = np.asarray(_cho_solve32(chol, jnp.asarray(r, jnp.float32)),
                        np.float64)
        a = a + da
    return a


def _solve_chol_ir(kxx: np.ndarray, y: np.ndarray,
                   iters: int = 3) -> np.ndarray:
    """float32 device factorisation + float64 host iterative refinement."""
    chol = _chol32(jnp.asarray(kxx, jnp.float32))
    return refine_with_factor(chol, np.asarray(kxx, np.float64), y,
                              iters=iters)


def solve_gp(kxx: np.ndarray, y: np.ndarray, jitter: float = 0.0,
             method: str = "auto", refine_iters: int = 3) -> np.ndarray:
    """Solve (Kxx + jitter*I) A = Y.  Consumes ``kxx`` (jitter in place)."""
    if jitter != 0.0:
        diag_add(kxx, jitter)
    if method == "auto":
        method = "scipy"
    if method == "scipy":
        return _solve_scipy(np.asarray(kxx, np.float64),
                            np.asarray(y, np.float64))
    if method == "chol":
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        a = _solve_chol(kxx, y, dtype)
        if not np.all(np.isfinite(a)):
            raise np.linalg.LinAlgError(
                "Cholesky solve produced non-finite solutions (matrix "
                "not positive-definite?); add jitter or use "
                "method='scipy'")
        return a
    if method == "chol_ir":
        return _solve_chol_ir(kxx, y, iters=refine_iters)
    if method == "chol_dist":
        from ..parallel.chol_dist import chol_solve_dist
        a, rel, _ = chol_solve_dist(kxx, y)   # jitter already applied above
        if rel > 1e-6:
            print(f"chol_dist: refinement stagnated at rel residual {rel:.2e}"
                  " — consider a larger --jitter")
        return a
    raise ValueError(f"unknown solve method {method!r}")


def predict(kzx: np.ndarray, a: np.ndarray) -> np.ndarray:
    """argmax(Kzx @ A) class predictions (reference: classify_gp.py:39-40)."""
    return np.argmax(np.asarray(kzx, a.dtype) @ a, axis=1)


def accuracy(pred: np.ndarray, labels: np.ndarray) -> float:
    return float(np.mean(np.asarray(pred) == np.asarray(labels)))


def predictive_variance(kxx: np.ndarray, kzx: np.ndarray,
                        kzz_diag: np.ndarray,
                        jitter: float = 0.0) -> np.ndarray:
    """GP posterior variance per test point:
    ``var_z = k_zz - k_zx (Kxx + jitter I)^-1 k_xz``.

    A capability the reference framework computes nowhere (it reports only
    argmax mean predictions, reference: exp_mnist_resnet/classify_gp.py:
    39-42) but that the underlying GP gives for free.  float64 host oracle
    via one Cholesky + a triangular solve; clipped at 0 (round-off can
    land epsilon-negative for nearly-interpolated points).  The
    device-resident matrix-free equivalent at large N is
    ``parallel.device_large.classify_device_large(variances=True)``.
    """
    import scipy.linalg
    kxx = np.array(kxx, np.float64)       # our private copy ...
    if jitter:
        diag_add(kxx, jitter)
    # ... factored in place: cho_factor would otherwise take a THIRD
    # whole-matrix copy (6.4 GB peak at 16k on the single-core host)
    c, low = scipy.linalg.cho_factor(kxx, lower=True, check_finite=False,
                                     overwrite_a=True)
    # v = L^-1 k_xz ; var = k_zz - sum(v^2)
    v = scipy.linalg.solve_triangular(c, np.asarray(kzx, np.float64).T,
                                      lower=low, check_finite=False)
    return np.maximum(np.asarray(kzz_diag, np.float64) - (v * v).sum(0),
                      0.0)


def gaussian_lpd(scores: np.ndarray, variances: np.ndarray,
                 labels: np.ndarray, noise: float,
                 n_classes: Optional[int] = None):
    """Held-out **log predictive density** of ±1 one-hot targets under
    the GP's Gaussian predictive: per test point,
    ``sum_c log N(y_c | mu_c, var + noise)`` with the posterior variance
    shared across classes (one kernel, C independent outputs) and the
    observation noise equal to the jitter the solve added
    (``info["jitter_raw"]`` — the model actually fit was
    ``y = f + eps, eps ~ N(0, jitter_raw)``).

    Returns ``(mean, se, per_point)``: mean LPD over test points, its
    standard error, and the [n] per-point values.  This is the held-out
    metric type-II ML optimises for — accuracy saturates at a task's
    label-noise ceiling while LPD keeps separating models by calibration
    (BASELINE.md "Held-out log predictive density").  The reference
    framework reports only argmax accuracy (reference:
    exp_mnist_resnet/classify_gp.py:39-42).

    Pure transform of per-point moments — same code path for the f64
    oracle and the device pipeline; the oracle gate is
    :func:`log_predictive_density` vs ``classify_device_large`` in
    tests/test_device_large.py.
    """
    scores = np.asarray(scores, np.float64)
    var = np.asarray(variances, np.float64) + float(noise)
    if np.any(var <= 0):
        raise ValueError("non-positive predictive variance + noise")
    y = one_hot_targets(np.asarray(labels), n_classes=n_classes
                        if n_classes is not None else scores.shape[1])
    if y.shape != scores.shape:
        raise ValueError(f"labels imply {y.shape}, scores {scores.shape}")
    c = scores.shape[1]
    per_point = (-0.5 * np.sum((y - scores) ** 2, axis=1) / var
                 - 0.5 * c * (np.log(2.0 * np.pi) + np.log(var)))
    mean = float(per_point.mean())
    se = float(per_point.std(ddof=1) / np.sqrt(len(per_point))) \
        if len(per_point) > 1 else 0.0
    return mean, se, per_point


def log_predictive_density(kxx: np.ndarray, kzx: np.ndarray,
                           kzz_diag: np.ndarray, train_labels: np.ndarray,
                           test_labels: np.ndarray,
                           jitter_rel: float = 0.0,
                           n_classes: Optional[int] = None):
    """Float64 host oracle for held-out LPD: one Cholesky of
    ``K + jitter_rel * mean(diag K) * I`` gives means, variances, and
    the density in one pass.  Relative-jitter convention shared with
    ``classify_device_large`` so the two are directly comparable.
    Returns ``(mean, se, per_point)`` as :func:`gaussian_lpd`."""
    import scipy.linalg
    kxx = np.array(kxx, np.float64)
    jr = jitter_rel * float(np.mean(np.diagonal(kxx)))
    if jr:
        diag_add(kxx, jr)
    y = one_hot_targets(np.asarray(train_labels), n_classes=n_classes)
    c, low = scipy.linalg.cho_factor(kxx, lower=True, check_finite=False,
                                     overwrite_a=True)
    alpha = scipy.linalg.cho_solve((c, low), y, check_finite=False)
    scores = np.asarray(kzx, np.float64) @ alpha
    v = scipy.linalg.solve_triangular(c, np.asarray(kzx, np.float64).T,
                                      lower=low, check_finite=False)
    var = np.maximum(np.asarray(kzz_diag, np.float64) - (v * v).sum(0),
                     0.0)
    return gaussian_lpd(scores, var, test_labels, jr,
                        n_classes=y.shape[1])


def log_marginal_likelihood(kxx: np.ndarray, y: np.ndarray,
                            jitter_rel: float = 0.0) -> float:
    """Float64 GP log evidence ``log p(y | X)`` summed over target dims:
    ``-1/2 tr(Y^T K'^-1 Y) - C/2 logdet K' - n C/2 log 2pi`` with
    ``K' = K + jitter_rel * mean(diag K) * I`` — the same
    *relative*-jitter convention as ``classify_device_large`` and the
    classify_e2e ``--jitter`` flag, so the two are directly comparable.
    The parameter is named ``jitter_rel`` (not ``jitter``) on purpose:
    ``solve_gp``/``predictive_variance`` take ABSOLUTE jitter, and on a
    ~1e12-diagonal NNGP Gram the same number means wildly different
    regularisation under the two conventions.

    The reference framework computes no evidence anywhere; this is the
    host oracle for the device-factor version
    (``classify_device_large`` -> ``info["log_evidence"]``, whose
    log-determinant reads the blocked factor's diagonal) and the
    non-differentiable counterpart of ``fit.neg_marginal_log_likelihood``.
    """
    import scipy.linalg
    kxx = np.array(kxx, np.float64)
    y = np.asarray(y, np.float64)
    if jitter_rel:
        diag_add(kxx, jitter_rel * float(np.mean(np.diagonal(kxx))))
    c, low = scipy.linalg.cho_factor(kxx, lower=True, check_finite=False,
                                     overwrite_a=True)
    alpha = scipy.linalg.cho_solve((c, low), y, check_finite=False)
    logdet = 2.0 * float(np.sum(np.log(np.diagonal(c))))
    n, n_cls = y.shape
    return float(-0.5 * np.sum(y * alpha) - 0.5 * n_cls * logdet
                 - 0.5 * n * n_cls * np.log(2.0 * np.pi))


def solve_gp_stats(kxx: np.ndarray, y: np.ndarray, jitter: float = 0.0,
                   splits=()) -> dict:
    """ONE float64 Cholesky serving the solve, per-split posterior
    variances, and the GP log evidence — what `classify_gp --variances`
    needs without paying three separate O(N^3) factorisations
    (`solve_gp` + `predictive_variance` + `log_marginal_likelihood` each
    factor from scratch; on this 1-core host a 16k factor is ~100 s).

    ``kxx`` is the full symmetrised matrix, CONSUMED (jitter added and
    factored in place); ``jitter`` is ABSOLUTE (the reference's
    classify_gp convention); ``splits`` is a sequence of
    ``(kzx [nz, n], kzz_diag [nz])`` pairs.  Returns
    ``{"alpha", "variances", "log_evidence"}``."""
    import scipy.linalg
    kxx = np.asarray(kxx, np.float64)
    if jitter:
        diag_add(kxx, jitter)
    c, low = scipy.linalg.cho_factor(kxx, lower=True, check_finite=False,
                                     overwrite_a=True)
    y64 = np.asarray(y, np.float64)
    alpha = scipy.linalg.cho_solve((c, low), y64, check_finite=False)
    logdet = 2.0 * float(np.sum(np.log(np.diagonal(c))))
    n, n_cls = y64.shape
    ev = float(-0.5 * np.sum(y64 * alpha) - 0.5 * n_cls * logdet
               - 0.5 * n * n_cls * np.log(2.0 * np.pi))
    variances = []
    for kzx, kzz in splits:
        v = scipy.linalg.solve_triangular(
            c, np.asarray(kzx, np.float64).T, lower=low,
            check_finite=False)
        variances.append(np.maximum(
            np.asarray(kzz, np.float64) - (v * v).sum(0), 0.0))
    return {"alpha": alpha, "variances": variances, "log_evidence": ev}


def classify(kxx: np.ndarray, train_labels: np.ndarray, jitter: float = 0.0,
             method: str = "auto", **splits: Tuple[np.ndarray, np.ndarray]
             ) -> dict:
    """Full GP classification: solve on Kxx, report accuracy per split.

    ``splits`` maps name -> (Kzx, labels).  Kxx may be upper-triangle-only.
    """
    kxx = symmetrize_from_upper(np.asarray(kxx, np.float64))
    a = solve_gp(kxx, one_hot_targets(train_labels), jitter=jitter,
                 method=method)
    return {name: accuracy(predict(kzx, a), labels)
            for name, (kzx, labels) in splits.items()}
