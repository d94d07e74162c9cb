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
  tile *regeneration* (the `classify_device_large` arithmetic), at one
  kernel-sweep cost per residual evaluation and a residual floor of
  float32 accumulation (~1e-6 relative; the retained mode reaches
  1e-10).  Predictions agree with the retained mode to that floor
  (tests/test_incremental.py::test_retain_gram_false_matches_retained).
  In this mode the training set and scalings are kept device-resident
  in capacity-sized buffers (uploaded once, grown in place per add), so
  residual sweeps re-upload only the [n, C] iterate, and each
  extension's [m, N]/[m, m] cross blocks are ASSEMBLED ON DEVICE by the
  same tile sweeps and handed to the factor without ever visiting the
  host (``_ShardedFactor.extend_device`` — round 3 measured the
  host-built path 0.7x of a refit at n=16k/m=2048 purely from the
  134 MB right-hand-side upload).  The remaining host transient is the
  first batch's [n0, n0] Gram.

The factor itself is row-sharded on the mesh in both modes.  For batch
(non-incremental) large-N classification use `classify_device_large`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import solve as solve_ops
from .chol_dist import _ShardedFactor, _blocked_residual_fn, _ir_solve
from .gram import compute_gram_diag, gram_in_memory
from .mesh import make_mesh

__all__ = ["IncrementalGP"]


@functools.partial(jax.jit, donate_argnums=0)
def _write_rows_jit(buf, rows, n0):
    """Grow a capacity-sized device buffer in place: write rows at offset
    ``n0`` (donated; one compile per extension width, offset traced — the
    `_extend_programs` caching convention)."""
    return lax.dynamic_update_slice(buf, rows,
                                    (n0,) + (0,) * (buf.ndim - 1))


@functools.partial(jax.jit, donate_argnums=0)
def _scale_cols_jit(w, s_cols):
    return w * s_cols[None, :]


@functools.partial(jax.jit, static_argnames=("b", "n", "snap"))
def _cs_assemble_jit(model, z_all, s_pad, offsets, b, n, snap):
    """[m_pad, m_pad] scaled new-new block ``D^-1/2 (K + jr I) D^-1/2``
    with unit diagonal, via the exact `_scaled_tile` arithmetic over the
    full new-new tile grid (one bounded scan; m per add() is small)."""
    from .device_large import _scaled_tile
    del snap
    m_pad = z_all.shape[0]

    def body(c, off):
        blk = _scaled_tile(model, z_all, s_pad, off[0], off[1], b, n)
        return lax.dynamic_update_slice(c, blk, (off[0], off[1])), None

    return lax.scan(body, jnp.zeros((m_pad, m_pad), jnp.float32),
                    offsets)[0]


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
    regeneration (see the module docstring for the accuracy/cost trade);
    ``tol`` is clamped to the float32 measurement floor in that mode and
    ``rel_residual`` is reported in scaled space — see `_resolve` for
    both conventions.
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
        # regen mode: capacity-sized device-resident training set and
        # float32 scalings, uploaded once and grown in place — residual
        # sweeps and extension cross-block assembly regenerate tiles from
        # these instead of re-uploading O(N) host data per call
        self._x_dev = None
        self._s_dev = None
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
        # pad_to=batch_size aligns the factor grid with the Gram-tile
        # grid so device-assembled cross blocks land inside the buffer
        f = _ShardedFactor(self.mesh, n, self.block,
                           capacity=self.capacity, pad_to=self.batch_size)
        # scaling with s from diag+jitter and the pinned unit diagonal IS
        # the equilibrated K + jitter_raw I (jitter is diagonal-only)
        f.factorize_scaled(k32, s.astype(np.float32))
        if self._k32 is not None:
            self._k32[:n, :n] = k32
        else:
            b = self.batch_size
            cap_pad = -(-self.capacity // b) * b
            xb = np.zeros((cap_pad,) + x.shape[1:], np.float32)
            xb[:n] = x
            sb = np.ones(cap_pad, np.float32)
            sb[:n] = s
            self._x_dev = jax.device_put(xb)
            self._s_dev = jax.device_put(sb)
        self._x, self._labels = x, labels
        self._s, self._factor = s, f

    def _extend(self, x, labels):
        n, m = self.n, len(x)
        if n + m > self.capacity:
            raise ValueError(f"add past capacity: n={n} + m={m} > "
                             f"capacity={self.capacity}")
        if self._k32 is not None:
            s_new = self._extend_host_blocks(x, n, m)
        else:
            s_new = self._extend_device_blocks(x, n, m)
        self._x = np.concatenate([self._x, x])
        self._labels = np.concatenate([self._labels, labels])
        self._s = np.concatenate([self._s, s_new])

    def _extend_host_blocks(self, x, n, m):
        """Retained-Gram extension: cross blocks computed into host
        arrays (they must land in the resident ``_k32`` anyway), scaled
        on host, re-uploaded by ``extend``."""
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
        self._k32[n:n + m, :n] = b_raw
        self._k32[:n, n:n + m] = b_raw.T
        self._k32[n:n + m, n:n + m] = c_raw
        return s_new

    def _extend_device_blocks(self, x, n, m):
        """Regen-mode extension: the [m, n] and [m, m] cross blocks are
        assembled ON DEVICE by the same scaled-tile sweeps the large-N
        classifier uses, and handed to ``extend_device`` — only the [m]
        new diagonal and the [m] Schur-gate diagonal ever cross the host
        link (the round-3 host path uploaded a [n_pad, m] right-hand
        side, 134 MB at n=16k/m=2048 — the measured reason isolated
        extension ran 0.7x of a refit on this tunnel)."""
        from .. import settings
        from .device_large import (_diag_scan_jit, _rect_offsets,
                                   _scaled_tile, _xz_scaled_chunk_jit)
        from .gram import _pad_to_multiple

        b = self.batch_size
        snap = settings.snapshot()
        z_all = jnp.asarray(_pad_to_multiple(np.asarray(x, np.float32), b))
        m_pad = z_all.shape[0]
        d_new = np.asarray(_diag_scan_jit(
            self.model, z_all,
            jnp.asarray(np.arange(0, m_pad, b, dtype=np.int32)),
            b, m, m_pad, snap), np.float64)[:m] + self._jitter_raw
        s_new = 1.0 / np.sqrt(d_new)
        s_new_pad = np.ones(m_pad, np.float32)
        s_new_pad[:m] = s_new
        s_new_dev = jnp.asarray(s_new_pad)

        with jax.default_matmul_precision("highest"):
            # W = s_old-row-scaled K(x_old, z), rows >= n zeroed, then
            # column-scaled by s_new (pad columns are sliced off below)
            w = jnp.zeros((self._factor.n_pad, m_pad), jnp.float32)
            w = _xz_scaled_chunk_jit(w, self.model, self._x_dev, z_all,
                                     self._s_dev, _rect_offsets(n, m_pad, b),
                                     b, n, snap)
            w = _scale_cols_jit(w, s_new_dev)
            # C_s = D^-1/2 (K_new + jr I) D^-1/2 with unit diagonal: the
            # exact `_scaled_tile` arithmetic over the full new-new grid
            c_s = _cs_assemble_jit(self.model, z_all, s_new_dev,
                                   _rect_offsets(m, m, b), b, m, snap)
            w = w[:, :m]
            c_s = c_s[:m, :m]
        # extend the factor FIRST: it raises (factor untouched) on a
        # non-PD extension, and then no host/device state has changed
        self._factor.extend_device(w, c_s)
        self._x_dev = _write_rows_jit(self._x_dev,
                                      jnp.asarray(np.asarray(x, np.float32)),
                                      np.int32(n))
        self._s_dev = _write_rows_jit(self._s_dev,
                                      jnp.asarray(s_new.astype(np.float32)),
                                      np.int32(n))
        return s_new

    def _resolve(self):
        """Posterior weights by float32 factor solve + float64 IR (the
        `chol_solve_ir32` machinery).  With the retained Gram, residuals
        are blocked float64 upcasts of the raw float32 matrix (raw
        space, scaled-space correction solves); without it, residuals
        are measured in scaled space through float32 tile regeneration
        — the `classify_device_large` arithmetic, one kernel sweep per
        evaluation against the device-resident training buffers, floor
        ~float32 accumulation.

        ``rel_residual`` convention differs by mode (the same numeric
        threshold means different things): retained mode reports the
        RAW-space ``max_c ||y - (K + jr I) a||_c / ||y||_c``; regen mode
        reports the SCALED-space ``max_c ||Sy - M a_s||_c / ||Sy||_c``
        of the equilibrated system the factor decomposed (rows weighted
        by ``1/sqrt(diag K + jr)``).  Both are scale-invariant; they
        agree in distribution for well-equilibrated systems but are not
        numerically interchangeable — compare residuals within one mode.

        In regen mode the requested ``tol`` is clamped to the float32
        regeneration-measurement floor ``3 sqrt(n) eps32`` (the
        `classify_device_large` constant): the default 1e-10 is
        unreachable there, and sweeping to stagnation just to observe no
        progress costs one extra full O(n^2) kernel regeneration per
        add()."""
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

        from .. import settings
        from .device_large import _matvec_scan, _upper_offsets

        b = self.batch_size
        snap = settings.snapshot()
        offsets = _upper_offsets(n, b)
        cap_pad = self._x_dev.shape[0]
        ys = s[:, None] * y64
        y_norm = np.linalg.norm(ys, axis=0)
        y_norm[y_norm == 0] = 1.0

        def residual(a_s):
            # M a_s via regenerated scaled tiles (pinned unit diagonal
            # IS the +jitter in scaled space — same matrix the factor
            # holds) against the device-resident x/s buffers: only the
            # [n, C] iterate crosses the link per sweep (the old path
            # re-padded and re-uploaded the whole training set each
            # evaluation).  Accumulation is float32 — the floor.
            a_pad = np.zeros((cap_pad, a_s.shape[1]), np.float32)
            a_pad[:n] = a_s
            with jax.default_matmul_precision("highest"):
                ma = np.asarray(_matvec_scan(
                    self.model, self._x_dev, self._s_dev, offsets,
                    jnp.asarray(a_pad), b, n, snap), np.float64)[:n]
            r = ys - ma
            return r, float(np.max(np.linalg.norm(r, axis=0) / y_norm))

        def precond(r64):
            return self._factor.solve(
                r64.astype(np.float32)).astype(np.float64)

        tol_eff = max(self.tol,
                      3.0 * np.sqrt(n) * float(np.finfo(np.float32).eps))
        a_s, self.rel_residual, self.refinements = _ir_solve(
            precond, residual, ys, self.refine_iters, tol_eff)
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
        """Whitened cross-covariance columns through the live factor in
        bounded column-chunk dispatches — shared with the store-based
        classify path (`chol_dist.variances_from_cross_host`)."""
        from .chol_dist import variances_from_cross_host
        return variances_from_cross_host(self._factor, self._s, kzx, kzz,
                                         chunk=chunk)
