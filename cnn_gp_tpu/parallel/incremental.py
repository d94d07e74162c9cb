"""Online GP classification: factor once, grow as labelled data arrives.

A TPU-native capability with **no reference counterpart**: adding
training data to the reference means recomputing the Gram HDF5 from
scratch and re-running the whole O(N^3) host LAPACK solve (reference:
exp_mnist_resnet/save_kernel.py:26-36, classify_gp.py:17-27).  Here the
device-resident blocked factor grows **in place**
(`chol_dist._ShardedFactor.extend`): each batch of m new points costs

* one [m, N] / [m, m] cross-covariance assembly (the same tile path as
  ordinary Gram computation),
* one m-wide block forward solve + an [m, m] Cholesky on the mesh
  (O(N^2 m) — not O((N+m)^3/3)),
* one factor solve + float64 iterative refinement for the posterior,

and the GP log evidence is re-read from the live factor's diagonal, so
model monitoring is free at every step.

Host-memory envelope — two modes:

* ``retain_gram=True`` (default): the raw float32 Gram is retained on
  host for the refinement matvec (same footprint class as
  `chol_solve_ir32` and the reference's own classify), so refinement
  residuals are float64-exact and this mode targets the regime where a
  [capacity, capacity] float32 fits on host.  The buffer is allocated
  ONCE at construction (np.zeros is lazily paged, so resident size
  grows with the data actually ingested) and extensions write new
  rows/columns in place — no per-add reallocation or O(N^2) copy.
* ``retain_gram=False``: nothing O(N^2) stays resident on the host —
  refinement residuals are measured in scaled space through float32
  tile *regeneration* (`device_large.gram_matvec_regen`, the same
  arithmetic `classify_device_large` refines against), at one
  kernel-sweep cost per residual evaluation and a residual floor of
  float32 accumulation (~1e-6 relative; the retained mode reaches
  1e-10).  Predictions agree with the retained mode to that floor
  (tests/test_incremental.py::test_retain_gram_false_matches_retained).
  Transients remain: the first batch's [n0, n0] Gram and each
  extension's [m, n] cross block.

The factor itself is row-sharded on the mesh in both modes.  For batch
(non-incremental) large-N classification use `classify_device_large`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import solve as solve_ops
from .chol_dist import _ShardedFactor, _blocked_residual_fn, _ir_solve
from .gram import compute_gram_diag, gram_in_memory
from .mesh import make_mesh

__all__ = ["IncrementalGP"]


class IncrementalGP:
    """Streaming GP classifier over a growing training set.

    ``capacity`` bounds the total training points the factor can grow to
    (reserved as identity-padded rows; factorisation cost scales with
    the padded size, so reserve what will plausibly be used).  ``jitter``
    is relative to the FIRST batch's mean Gram diagonal and stays frozen
    — the same convention as ``classify_device_large``.

    ``n_classes`` pins the score width for streaming use: left at None
    it is inferred as ``max(labels seen) + 1``, so a class absent from
    the stream so far cannot be predicted and ``scores()`` widens
    mid-stream when it first appears.

    ``retain_gram=False`` drops the resident [capacity, capacity] host
    Gram: refinement residuals are then measured through float32 tile
    regeneration (see the module docstring for the accuracy/cost
    trade).
    """

    def __init__(self, model, capacity: int, batch_size: int = 128,
                 block: int = 256, jitter: float = 0.0, mesh=None,
                 refine_iters: int = 10, tol: float = 1e-10,
                 n_classes: Optional[int] = None,
                 retain_gram: bool = True):
        self.model = model
        self.n_classes = n_classes
        self.capacity = int(capacity)
        self.batch_size = batch_size
        self.block = block
        self.jitter = jitter
        self.mesh = mesh if mesh is not None else make_mesh()
        self.refine_iters = refine_iters
        self.tol = tol
        self._x = None                    # [n, C, H, W] float32
        self._labels = None
        # raw float32 Gram, preallocated at full capacity (lazily paged:
        # resident memory grows with ingested data, and extensions never
        # reallocate or copy the old [n, n] block); None in the
        # nothing-O(N^2)-resident mode
        self._k32 = (np.zeros((self.capacity, self.capacity), np.float32)
                     if retain_gram else None)
        self._s = None                    # float64 equilibration scalings
        self._jitter_raw = None
        self._factor: Optional[_ShardedFactor] = None
        self._alpha = None                # float64 posterior weights
        self.rel_residual = None
        self.refinements = None

    @property
    def n(self) -> int:
        return 0 if self._x is None else len(self._x)

    def add(self, x, labels) -> dict:
        """Ingest a batch of labelled examples and refresh the posterior.

        Returns ``{"n", "rel_residual", "refinements", "log_evidence"}``.
        """
        x = np.asarray(x, np.float32)
        labels = np.asarray(labels)
        assert len(x) == len(labels) and len(x) > 0
        if self._factor is None:
            self._first_fit(x, labels)
        else:
            self._extend(x, labels)
        self._resolve()
        return {"n": self.n, "rel_residual": self.rel_residual,
                "refinements": self.refinements,
                "log_evidence": self.log_evidence()}

    def _first_fit(self, x, labels):
        n = len(x)
        if n > self.capacity:
            raise ValueError(f"first batch {n} exceeds capacity "
                             f"{self.capacity}")
        k32 = gram_in_memory(self.model, x, batch_size=self.batch_size)
        d64 = np.ascontiguousarray(np.diagonal(k32)).astype(np.float64)
        self._jitter_raw = self.jitter * float(np.mean(d64))
        s = 1.0 / np.sqrt(d64 + self._jitter_raw)
        f = _ShardedFactor(self.mesh, n, self.block,
                           capacity=self.capacity)
        # scaling with s from diag+jitter and the pinned unit diagonal IS
        # the equilibrated K + jitter_raw I (jitter is diagonal-only)
        f.factorize_scaled(k32, s.astype(np.float32))
        if self._k32 is not None:
            self._k32[:n, :n] = k32
        self._x, self._labels = x, labels
        self._s, self._factor = s, f

    def _extend(self, x, labels):
        n, m = self.n, len(x)
        if n + m > self.capacity:
            raise ValueError(f"add past capacity: n={n} + m={m} > "
                             f"capacity={self.capacity}")
        b_raw = gram_in_memory(self.model, x, self._x,
                               batch_size=self.batch_size)   # [m, n]
        c_raw = gram_in_memory(self.model, x,
                               batch_size=self.batch_size)   # [m, m]
        d_new = (np.ascontiguousarray(np.diagonal(c_raw)).astype(np.float64)
                 + self._jitter_raw)
        s_new = 1.0 / np.sqrt(d_new)
        b_s = (s_new[:, None] * b_raw.astype(np.float64)
               * self._s[None, :]).astype(np.float32)
        c_s = (s_new[:, None] * (c_raw.astype(np.float64)
                                 + self._jitter_raw * np.eye(m))
               * s_new[None, :])
        np.fill_diagonal(c_s, 1.0)        # exact unit diagonal
        # extend the factor FIRST: it raises (factor untouched) on a
        # non-PD extension, and then no host state has changed either
        self._factor.extend(b_s, c_s.astype(np.float32))

        if self._k32 is not None:
            self._k32[n:n + m, :n] = b_raw
            self._k32[:n, n:n + m] = b_raw.T
            self._k32[n:n + m, n:n + m] = c_raw
        self._x = np.concatenate([self._x, x])
        self._labels = np.concatenate([self._labels, labels])
        self._s = np.concatenate([self._s, s_new])

    def _resolve(self):
        """Posterior weights by float32 factor solve + float64 IR (the
        `chol_solve_ir32` machinery).  With the retained Gram, residuals
        are blocked float64 upcasts of the raw float32 matrix (raw
        space, scaled-space correction solves); without it, residuals
        are measured in scaled space through float32 tile regeneration
        — the `classify_device_large` arithmetic, one kernel sweep per
        evaluation, floor ~float32 accumulation."""
        n, s = self.n, self._s
        y64 = solve_ops.one_hot_targets(self._labels, self.n_classes)
        if self._k32 is not None:
            residual = _blocked_residual_fn(self._k32[:n, :n], y64,
                                            self._jitter_raw)

            def precond(r64):
                return s[:, None] * self._factor.solve(
                    (s[:, None] * r64).astype(np.float32)
                ).astype(np.float64)

            self._alpha, self.rel_residual, self.refinements = _ir_solve(
                precond, residual, y64, self.refine_iters, self.tol)
            return

        from .device_large import gram_matvec_regen

        ys = s[:, None] * y64
        y_norm = np.linalg.norm(ys, axis=0)
        y_norm[y_norm == 0] = 1.0

        def residual(a_s):
            # M a_s via regenerated scaled tiles (pinned unit diagonal
            # IS the +jitter in scaled space — same matrix the factor
            # holds); accumulation is float32, which sets the floor
            ma = gram_matvec_regen(self.model, self._x,
                                   a_s.astype(np.float32),
                                   batch_size=self.batch_size,
                                   s=s).astype(np.float64)
            r = ys - ma
            return r, float(np.max(np.linalg.norm(r, axis=0) / y_norm))

        def precond(r64):
            return self._factor.solve(
                r64.astype(np.float32)).astype(np.float64)

        a_s, self.rel_residual, self.refinements = _ir_solve(
            precond, residual, ys, self.refine_iters, self.tol)
        self._alpha = s[:, None] * a_s

    def log_evidence(self) -> float:
        """GP log marginal likelihood of the current training set, read
        from the live factor (float64 oracle:
        ``ops.solve.log_marginal_likelihood``)."""
        self._require_data()
        logdet = (2.0 * self._factor.log_diag_sum()
                  - 2.0 * float(np.sum(np.log(self._s))))
        y64 = solve_ops.one_hot_targets(self._labels, self.n_classes)
        n_cls = y64.shape[1]
        return (-0.5 * float(np.sum(y64 * self._alpha))
                - 0.5 * n_cls * logdet
                - 0.5 * self.n * n_cls * np.log(2.0 * np.pi))

    def _require_data(self):
        if self._alpha is None:
            raise RuntimeError("add() labelled data before predicting")

    def save_posterior(self, path, config_name: str = "") -> str:
        """Persist the CURRENT posterior as the O(N) serving artifact
        (``cnn_gp_tpu.serving``): an online-grown model is served exactly
        like a batch-solved one — ``GPPredictor`` over the saved file
        reproduces this object's predictions and (after a solve-free
        factor rebuild) its variances.  Returns the final path."""
        from ..serving import save_posterior as _save
        self._require_data()
        return _save(path, train_x=self._x, alpha=self._alpha,
                     scalings=self._s, jitter_raw=self._jitter_raw,
                     config_name=config_name)

    def scores(self, x) -> np.ndarray:
        """Posterior mean scores ``K(x, X_train) @ alpha`` per class."""
        self._require_data()
        kzx = gram_in_memory(self.model, np.asarray(x, np.float32),
                             self._x, batch_size=self.batch_size)
        return kzx.astype(np.float64) @ self._alpha

    def classify(self, x) -> np.ndarray:
        return np.argmax(self.scores(x), axis=1)

    def predict(self, x, chunk: int = 512):
        """``(scores, variances)`` for one query batch, computing the
        [nz, n] cross-covariance ONCE — ``classify(z)`` followed by
        ``variances(z)`` regenerates the full NNGP kernel over nz*n pairs
        twice, and the kernel sweep is the dominant cost."""
        self._require_data()
        x = np.asarray(x, np.float32)
        if len(x) == 0:
            return (np.zeros((0, self._alpha.shape[1]), np.float64),
                    np.zeros(0, np.float64))
        kzx = gram_in_memory(self.model, x, self._x,
                             batch_size=self.batch_size)
        kzz = compute_gram_diag(self.model, x, batch_size=self.batch_size,
                                progress=False).astype(np.float64)
        return (kzx.astype(np.float64) @ self._alpha,
                self._variances_from_cross(kzx, kzz, chunk))

    def variances(self, x, chunk: int = 512) -> np.ndarray:
        """GP posterior variances ``k_zz - k_zx (K + jr I)^-1 k_xz``
        through the live factor (use :meth:`predict` when scores are also
        needed — it shares the cross-covariance sweep).  Valid across
        extensions because the factor is always the factor of the full
        current system.  Float32 accumulation floor ~eps32 * k_zz;
        float64 oracle: ``ops.solve.predictive_variance``."""
        self._require_data()
        x = np.asarray(x, np.float32)
        if len(x) == 0:
            return np.zeros(0, np.float64)
        kzx = gram_in_memory(self.model, x, self._x,
                             batch_size=self.batch_size)
        kzz = compute_gram_diag(self.model, x, batch_size=self.batch_size,
                                progress=False).astype(np.float64)
        return self._variances_from_cross(kzx, kzz, chunk)

    def _variances_from_cross(self, kzx, kzz, chunk: int) -> np.ndarray:
        """Whitened cross-covariance columns by block forward
        substitution, in bounded column-chunk dispatches — the
        `device_large` recipe, NOT one monolithic [n_pad, n_test] program
        (CLAUDE.md bounded-program rules).  The dispatch width is
        quantised to powers of two (capped at ``chunk``) so repeated
        queries of varying size reuse a handful of compiled
        `forward_sumsq` programs instead of one per distinct nz — program
        shipping dominates on tunneled runtimes.  Tail columns are
        zero-padded (they whiten to zero and are discarded)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        nz = len(kzx)
        cb = min(chunk, max(16, 1 << (nz - 1).bit_length()))
        nz_pad = -(-nz // cb) * cb
        repl = NamedSharding(self.mesh, P())
        w = np.zeros((self._factor.n_pad, cb), np.float32)
        sums = np.empty(nz_pad, np.float64)
        for c0 in range(0, nz_pad, cb):
            hi = min(c0 + cb, nz)
            w[: self.n, : hi - c0] = self._s[:, None] * kzx[c0:hi].T.astype(
                np.float64)
            if hi - c0 < cb:
                w[: self.n, hi - c0:] = 0.0
            sums[c0:c0 + cb] = np.asarray(self._factor.forward_sumsq(
                jax.device_put(w, repl)), np.float64)
        return np.maximum(kzz - sums[:nz], 0.0)
