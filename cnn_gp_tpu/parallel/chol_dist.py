"""Mesh-distributed blocked Cholesky and triangular solves.

TPU-native replacement for the reference's single-process CPU LAPACK solve
(reference: exp_mnist_resnet/classify_gp.py:17-27).  The train Gram is
**row-sharded** over the mesh and factorised in place by a blocked
right-looking Cholesky: at block step k the panel column is all-gathered,
the diagonal block is factorised redundantly on every device (cheap,
replicated), and the O(N^2 B) trailing update — where all the FLOPs are —
runs as MXU matmuls per device on its local rows.  The factorisation is
ONE compiled program applied once per block step from a host loop with the
buffer donated through every call (`_factor_step_fn` explains why a
single fori_loop-over-steps program is not memory-safe), so the compiled
payload is bounded regardless of N — this matters on runtimes that ship
programs over a network (see BASELINE.md on the tunnel's remote-compile
limits, which killed whole-matrix `lax.linalg.cholesky` at 16k^2).

Numerics: NNGP Grams of the paper configs have diagonals ~1e12
(solve_dist.py).  We solve the Jacobi-equilibrated system
``D^-1/2 (K + jitter I) D^-1/2`` (unit diagonal — equilibration
approximately minimises the condition number over diagonal scalings),
factorise in float32 on device (MXU speed), and recover float64-quality
solutions by iterative refinement: float64 residuals on the host, float32
correction solves against the device-resident factor.  This is the
float32-TPU answer to the reference's "must be float64" assertion
(classify_gp.py:19-23).

Distributed triangular solves use the factor in place: forward/backward
substitution over block rows, with the diagonal blocks returned replicated
by the factorisation (no per-step re-gather) and one [N, nrhs] collective
per block step.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

__all__ = ["chol_solve_dist", "chol_solve_ir32", "chol_solve_dist_from_store",
           "chol_solve_stream_from_store",
           "cholesky_sharded", "cholesky_solve_sharded",
           "variances_from_cross_host", "evidence_from_factor"]


def _chunk_starts(total: int, size: int):
    """Fixed-size chunk starts covering [0, total) with a slid-back tail:
    the last chunk starts at ``total - size`` (overlapping rewrites must
    be idempotent at the call site), so ONE compiled program shape serves
    every chunk.  Requires ``size <= total``."""
    assert 0 < size <= total, (size, total)
    return list(range(0, total - size, size)) + [total - size]


def _pad_size(n: int, block: int, n_dev: int, pad_to: int = 1) -> int:
    """Smallest N_pad >= n divisible by ``block``, ``n_dev`` and ``pad_to``
    (the latter lets device_large.py align the factor buffer with its
    Gram-tile grid so assembly writes land inside it)."""
    step = int(np.lcm(np.lcm(block, n_dev), pad_to))
    return int(-(-n // step) * step)


# tiny fetch helper: only the [m] diagonal of a small device matrix
# crosses the host link (used by the extend() SPD gate)
_diag_j = jax.jit(lambda a: jnp.diagonal(a))


def _blocked_residual_fn(k, y64: np.ndarray, jitter: float,
                         io_rows: int = 8192):
    """Residual closure ``a -> (Y - (K + jitter I) a, max rel norm)`` with
    the float64 upcast done in bounded row blocks (never a second
    whole-matrix host copy).  ``k`` is the [n, n] host matrix (float32 or
    float64; views are fine — each block is copied by the upcast)."""
    n = k.shape[0]
    y_norm = np.linalg.norm(y64, axis=0)
    y_norm[y_norm == 0] = 1.0

    def residual(a):
        r = np.empty_like(y64)
        for i0 in range(0, n, io_rows):
            i1 = min(i0 + io_rows, n)
            r[i0:i1] = y64[i0:i1] - k[i0:i1].astype(np.float64) @ a
        if jitter:
            r -= jitter * a
        return r, float(np.max(np.linalg.norm(r, axis=0) / y_norm))

    return residual


def _ir_solve(precond, residual, y64: np.ndarray, refine_iters: int,
              tol: float):
    """Float64 iterative refinement against a float32 factor: ``precond``
    maps a float64 residual to a correction (one factor solve), ``residual``
    is a `_blocked_residual_fn`-style closure.  Keeps the best iterate and
    stops on ``tol`` or stagnation — a sweep that shrinks the best
    residual by less than 10% (IR against a Cholesky factor converges at
    a fast linear rate until the factor's accuracy floor, where it
    plateaus/oscillates; every further sweep costs a full residual pass
    for nothing).  Shared by `chol_solve_dist`, `chol_solve_ir32`, and
    `IncrementalGP`.  Returns ``(best_a, best_rel, iters)``."""
    a = precond(y64)
    r, rel = residual(a)
    best_a, best_rel = a, rel
    iters = 0
    while iters < refine_iters and best_rel > tol:
        iters += 1
        a = a + precond(r)
        r, rel = residual(a)
        prev_best = best_rel
        if rel < best_rel:
            best_a, best_rel = a, rel
        if rel > 0.9 * prev_best:            # <10% progress: stagnated at
            break                            # the factor's floor
    return best_a, best_rel, iters


def _factor_step_fn(axis: str, n_pad: int, block: int, rows_local: int):
    """One block step of the right-looking factorisation, as its own
    program.  The host drives the ``nb`` steps in a Python loop, donating
    the buffer through every call (``_ShardedFactor._factorize_dev``) —
    NOT a single program with a ``fori_loop`` over steps: XLA gives the
    big while-loop carry a fresh (and layout-rotated) buffer, an extra
    N_pad^2 copy that OOMs a 16 GB chip at N=50k (measured; so does
    ``lax.linalg.triangular_solve`` of the [n_pad, block] panel, hence
    the explicit small-triangular-inverse + MXU matmul below — on the
    equilibrated unit-diagonal system the inverse is benign, and float64
    refinement cleans up the last ~ulp anyway).  Per-step temp is
    ~3 x [n_pad, block] (measured 0.4 GB at 16k against a 1.07 GB
    buffer), and the compiled payload stays bounded regardless of N."""
    nb = n_pad // block

    def step(k_loc, diags, kb):
        # k_loc: [rows_local, n_pad] local rows, lower triangle valid
        me = lax.axis_index(axis)
        grow = me * rows_local + jnp.arange(rows_local)      # global rows
        cols = jnp.arange(block)
        c0 = kb * block
        # panel column, gathered: [n_pad, block].  Pre-masked to its
        # valid lower-triangle region: the inverse matmul below would mix
        # strictly-upper garbage into kept entries via 0 * NaN (a
        # triangular_solve only ever read the valid entries; the matmul
        # touches the whole row).  For kept outputs this is a no-op:
        # x[i, j] only consumes pcol[i, m] with m <= j <= grow_i - c0.
        pcol = lax.dynamic_slice(k_loc, (0, c0), (rows_local, block))
        pcol = jnp.where(grow[:, None] >= c0 + cols[None, :], pcol, 0.0)
        pfull = lax.all_gather(pcol, axis, axis=0, tiled=True)
        dblk = lax.dynamic_slice(pfull, (c0, 0), (block, block))
        # the factor's contract is lower-triangle-only input (the
        # large-N assembly never writes the upper half); rebuild the
        # diagonal block's upper from its lower explicitly —
        # jnp.linalg.cholesky would otherwise symmetrize as
        # (A + A^T)/2 and halve every entry whose mirror is unwritten
        dblk = jnp.tril(dblk) + jnp.tril(dblk, -1).T
        lkk = lax.linalg.cholesky(dblk, symmetrize_input=False)
        linv = lax.linalg.triangular_solve(
            lkk, jnp.eye(block, dtype=k_loc.dtype), left_side=True,
            lower=True)
        # panel solve X @ Lkk^T = panel as one MXU matmul (local rows)
        x = pcol @ linv.T
        # keep only the lower triangle of the factor: row >= column
        x = jnp.where(grow[:, None] >= c0 + cols[None, :], x, 0.0)
        k_loc = lax.dynamic_update_slice(k_loc, x, (0, c0))
        xfull = lax.all_gather(x, axis, axis=0, tiled=True)
        # trailing update, one column block at a time: a single
        # full-width matmul would materialise a [rows_local, n_pad]
        # temporary (10.5 GB at N=50k on one device); blockwise, the
        # temp is [rows_local, block] and only the nb-kb-1 trailing
        # blocks are touched at all
        xm = x * (grow >= c0 + block)[:, None]

        def upd(cb, k_loc):
            c1 = cb * block
            xf = lax.dynamic_slice(xfull, (c1, 0), (block, block))
            kblk = lax.dynamic_slice(k_loc, (0, c1),
                                     (rows_local, block))
            return lax.dynamic_update_slice(k_loc, kblk - xm @ xf.T,
                                            (0, c1))

        k_loc = lax.fori_loop(kb + 1, nb, upd, k_loc)
        diags = lax.dynamic_update_slice(diags, lkk[None], (kb, 0, 0))
        return k_loc, diags

    return step


def _solve_fn(axis: str, n_pad: int, block: int, rows_local: int, nrhs: int,
              forward_only: bool = False):
    nb = n_pad // block

    def solve(l_loc, diags, b):  # b: [n_pad, nrhs] replicated
        me = lax.axis_index(axis)
        grow = me * rows_local + jnp.arange(rows_local)

        def fwd(kb, b):          # L y = b, block forward substitution
            c0 = kb * block
            bk = lax.dynamic_slice(b, (c0, 0), (block, nrhs))
            yk = lax.linalg.triangular_solve(diags[kb], bk, left_side=True,
                                             lower=True)
            pl = lax.dynamic_slice(l_loc, (0, c0), (rows_local, block))
            # where-mask, not multiply: rows above the diagonal may hold
            # arbitrary unwritten garbage (lower-triangle-only contract)
            pl = jnp.where((grow >= c0 + block)[:, None], pl, 0.0)
            contrib = pl @ yk
            b = b - lax.all_gather(contrib, axis, axis=0, tiled=True)
            return lax.dynamic_update_slice(b, yk, (c0, 0))

        def bwd(i, a):           # L^T a = y, block backward substitution
            kb = nb - 1 - i
            c0 = kb * block
            pl = lax.dynamic_slice(l_loc, (0, c0), (rows_local, block))
            pl = jnp.where((grow >= c0 + block)[:, None], pl, 0.0)
            a_loc = lax.dynamic_slice(a, (me * rows_local, 0),
                                      (rows_local, nrhs))
            part = lax.psum(pl.T @ a_loc, axis)
            yk = lax.dynamic_slice(a, (c0, 0), (block, nrhs))
            ak = lax.linalg.triangular_solve(diags[kb], yk - part,
                                             left_side=True, lower=True,
                                             transpose_a=True)
            return lax.dynamic_update_slice(a, ak, (c0, 0))

        y = lax.fori_loop(0, nb, fwd, b)
        if forward_only:         # L^-1 b (whitening; predictive variance)
            return y
        return lax.fori_loop(0, nb, bwd, y)

    return solve


class _ShardedFactor:
    """A device-resident sharded Cholesky factor plus its solve program."""

    def __init__(self, mesh: Mesh, n: int, block: int, pad_to: int = 1,
                 capacity: Optional[int] = None):
        """``capacity`` reserves identity-padded rows beyond ``n`` so the
        factored system can later grow in place via :meth:`extend` (online
        data addition).  Factorisation cost scales with the padded size —
        O(n_pad^3), identity rows included — so reserve only what will be
        used."""
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n = n
        self.block = block
        n_dev = mesh.devices.size
        self.n_pad = _pad_size(max(n, capacity or n), block, n_dev, pad_to)
        self.rows_local = self.n_pad // n_dev
        self.l_loc = None
        self.diags = None
        self._solvers = {}

    def _upload_rows(self, make_rows, io_rows: int = 4096):
        """Build the row-sharded device matrix in bounded row chunks
        (blocked host->device I/O: never a second whole-matrix host copy,
        independent of the device count — a per-device-shard upload would
        still be the full matrix on a one-chip mesh).

        ``make_rows(r0, r1) -> float32 [r1-r0, n_pad]`` produces global
        rows [r0, r1) already padded/identity-extended.  The tail chunk
        is handled by sliding the last window back (idempotent rewrite),
        so ONE compiled writer program serves every chunk.
        """
        row = NamedSharding(self.mesh, P(self.axis, None))
        n_pad = self.n_pad

        @functools.partial(jax.jit, static_argnames=("n_pad",),
                           out_shardings=row)
        def init(n_pad):
            return jnp.zeros((n_pad, n_pad), jnp.float32)

        @functools.partial(jax.jit, donate_argnums=0, out_shardings=row)
        def write(k, rows, r0):
            return lax.dynamic_update_slice(k, rows, (r0, 0))

        k = init(n_pad)
        c = min(io_rows, n_pad)
        for r0 in _chunk_starts(n_pad, c):
            k = write(k, jnp.asarray(make_rows(r0, r0 + c)), np.int32(r0))
        return k

    def factorize(self, ks32: np.ndarray) -> None:
        """Upload (row-sharded, identity-padded) and factorise in place."""
        n, n_pad = self.n, self.n_pad

        def make_rows(r0, r1):
            out = np.zeros((r1 - r0, n_pad), np.float32)
            if r0 < n:
                out[:n - r0, :n] = ks32[r0:min(r1, n)]
            pad = np.arange(max(r0, n), r1)   # identity padding leaves the
            out[pad - r0, pad] = 1.0          # factor of K intact
            return out

        self._factorize_dev(self._upload_rows(make_rows))

    def factorize_scaled(self, k32: np.ndarray, s32: np.ndarray) -> None:
        """Factorise diag(s) K diag(s) without materialising the scaled
        matrix on host: each device shard is scaled during upload, and the
        scaled diagonal is pinned to exactly 1 (Jacobi equilibration)."""
        n, n_pad = self.n, self.n_pad

        def make_rows(r0, r1):
            out = np.zeros((r1 - r0, n_pad), np.float32)
            if r0 < n:
                hi = min(r1, n)
                out[:hi - r0, :n] = (k32[r0:hi] * s32[r0:hi, None]
                                     * s32[None, :])
            diag = np.arange(r0, r1)          # unit diagonal (rows >= n:
            out[diag - r0, diag] = 1.0        # identity padding)
            return out

        self._factorize_dev(self._upload_rows(make_rows))

    def factorize_device(self, k_dev, s32=None) -> None:
        """Factorise a Gram that already lives on device ([n, n] float32),
        skipping the host->device upload entirely (it dominates wall-clock
        on tunneled runtimes: measured 68s for 1 GB vs 2.6s of factor
        compute at 16k).  Optionally applies Jacobi scaling by ``s32``
        (host [n] float32) with the scaled diagonal pinned to 1.

        ``k_dev`` is **consumed** (donated into the pad/scale program);
        the caller must not use it afterwards."""
        n, n_pad = self.n, self.n_pad
        row = NamedSharding(self.mesh, P(self.axis, None))
        scaled = s32 is not None

        # k is donated: its HBM is released into the program (peak is
        # still ~[n^2 + n_pad^2] while the pad-copy reads it, so this
        # path tops out around ~40k on one 16 GB chip -- past that, use
        # classify_device_large, which assembles straight into the
        # factor buffer and never holds two copies)
        @functools.partial(jax.jit, donate_argnums=0, out_shardings=row)
        def prep(k, s):
            if scaled:
                k = k * s[:, None] * s[None, :]
            kp = jnp.zeros((n_pad, n_pad), jnp.float32)
            kp = kp.at[:n, :n].set(k)
            diag = jnp.arange(n_pad) if scaled else jnp.arange(n, n_pad)
            return kp.at[diag, diag].set(1.0)

        args = (k_dev, jnp.asarray(s32) if scaled else jnp.zeros((n,),
                                                                 jnp.float32))
        self._factorize_dev(prep(*args))

    def factorize_padded_scaled(self, k_dev, s32: np.ndarray) -> None:
        """Scale an ALREADY-PADDED row-sharded device matrix to
        diag(s) K diag(s) on device (one elementwise pass over the
        donated buffer — no second [n_pad, n_pad] resident, which would
        OOM a 16 GB chip at 50k) with the scaled diagonal pinned to 1,
        then factorise.  For the streamed upload path
        (`chol_solve_stream_from_store`), where the Jacobi scalings are
        only known after the full diagonal has streamed past."""
        n, n_pad = self.n, self.n_pad
        row = NamedSharding(self.mesh, P(self.axis, None))

        @functools.partial(jax.jit, donate_argnums=0, out_shardings=row)
        def prep(k, s_pad):
            k = k * (s_pad[:, None] * s_pad[None, :])
            diag = jnp.arange(n_pad)
            return k.at[diag, diag].set(1.0)

        s_pad = np.ones(n_pad, np.float32)
        s_pad[:n] = s32
        self._factorize_dev(prep(k_dev, jnp.asarray(s_pad)))

    def _factorize_dev(self, k_dev) -> None:
        row = NamedSharding(self.mesh, P(self.axis, None))
        repl = NamedSharding(self.mesh, P())
        nb = self.n_pad // self.block
        if "factor_step" not in self._solvers:
            # cached on the instance: a loop that re-factorises through
            # the same factor object (fit_large's probed path, one
            # factorisation per optimisation step) must reuse ONE
            # compiled step program, not rebuild the jit every step
            self._solvers["factor_step"] = jax.jit(jax.shard_map(
                _factor_step_fn(self.axis, self.n_pad, self.block,
                                self.rows_local),
                mesh=self.mesh, in_specs=(P(self.axis, None), P(), P()),
                out_specs=(P(self.axis, None), P()),
                # the diag stack and solve outputs are replicated by
                # construction (all devices compute them from all-gathered /
                # psum'd values); skip the varying-manner check that cannot
                # see through the loop carries
                check_vma=False),
                donate_argnums=(0, 1), out_shardings=(row, repl))
        step = self._solvers["factor_step"]
        diags = jax.device_put(
            np.zeros((nb, self.block, self.block), np.float32), repl)
        # TPU f32 matmuls default to bf16 accumulation -- fatal inside a
        # Cholesky (SURVEY.md "hard parts"); trace at full f32 precision.
        # One compiled program (kb is a traced scalar), nb dispatches,
        # buffer donated through every call -- see _factor_step_fn.
        with jax.default_matmul_precision("highest"):
            for kb in range(nb):
                k_dev, diags = step(k_dev, diags, np.int32(kb))
        self.l_loc, self.diags = k_dev, diags

    def forward_sumsq(self, w_dev) -> jax.Array:
        """``sum(L^-1 W ** 2, axis=0)`` for a device-resident replicated
        ``W`` [n_pad, m]: the squared whitened cross-covariance column
        norms that predictive variance subtracts
        (``device_large.classify_device_large(variances=True)``).  One
        bounded program per (m,) shape."""
        m = w_dev.shape[1]
        key = ("fwd_sumsq", m)
        if key not in self._solvers:
            fwd = _solve_fn(self.axis, self.n_pad, self.block,
                            self.rows_local, m, forward_only=True)

            def sumsq(l_loc, diags, w):
                v = fwd(l_loc, diags, w)
                return jnp.sum(v * v, axis=0)

            # no donation: the [m] output can never alias the [n_pad, m]
            # input, and an unusable donation only emits warnings; W is
            # dropped by the caller right after the call anyway
            self._solvers[key] = jax.jit(jax.shard_map(
                sumsq, mesh=self.mesh, in_specs=(P(self.axis, None), P(),
                                                 P()),
                out_specs=P(), check_vma=False))
        with jax.default_matmul_precision("highest"):
            return self._solvers[key](self.l_loc, self.diags, w_dev)

    def _forward_solve(self, w_dev) -> jax.Array:
        """``L^-1 W`` for a replicated device ``W`` [n_pad, m] (block
        forward substitution through the live factor)."""
        m = w_dev.shape[1]
        key = ("fwd_full", m)
        if key not in self._solvers:
            self._solvers[key] = jax.jit(jax.shard_map(
                _solve_fn(self.axis, self.n_pad, self.block,
                          self.rows_local, m, forward_only=True),
                mesh=self.mesh, in_specs=(P(self.axis, None), P(), P()),
                out_specs=P(), check_vma=False))
        with jax.default_matmul_precision("highest"):
            return self._solvers[key](self.l_loc, self.diags, w_dev)

    def _extend_programs(self, m: int):
        """Compiled programs for :meth:`extend`, cached per extension
        width ``m`` — the insertion offset ``n0`` is a traced scalar, so
        streaming callers (`IncrementalGP.add` once per arriving batch)
        pay ONE compile per batch width, not one per call."""
        key = ("extend", m)
        if key not in self._solvers:
            axis, rows_local = self.axis, self.rows_local
            row = NamedSharding(self.mesh, P(self.axis, None))

            @jax.jit
            def schur_chol(y, c):
                # pad rows of y are zero, so y^T y sums real rows only
                return lax.linalg.cholesky(c - y.T @ y)

            def upd(l_loc, y, l22, n0):
                nr = y.T                   # [m, n_pad] new factor rows
                nr = lax.dynamic_update_slice(nr, jnp.tril(l22), (0, n0))
                me = lax.axis_index(axis)
                base = me * rows_local
                npad = l_loc.shape[1]

                # write the m new rows one dynamic_update_slice each: a
                # vectorised nr[clip(grow - n0)] gather materialises a
                # FULL [rows_local, n_pad] intermediate next to the
                # donated buffer — at 50k capacity on one device that is
                # a second ~10 GB allocation and a measured HBM OOM
                # (18.9/15.75 GB); the row loop keeps the peak at
                # l_loc + [m, n_pad]
                def body(k, l_loc):
                    loc = n0 + k - base        # local row index, if owned
                    owned = (loc >= 0) & (loc < rows_local)
                    idx = jnp.clip(loc, 0, rows_local - 1)
                    cur = lax.dynamic_slice(l_loc, (idx, 0), (1, npad))
                    new = lax.dynamic_slice(nr, (k, 0), (1, npad))
                    return lax.dynamic_update_slice(
                        l_loc, jnp.where(owned, new, cur), (idx, 0))

                return lax.fori_loop(0, m, body, l_loc)

            upd_j = jax.jit(jax.shard_map(
                upd, mesh=self.mesh,
                in_specs=(P(self.axis, None), P(), P(), P()),
                out_specs=P(self.axis, None), check_vma=False),
                donate_argnums=0, out_shardings=row)
            self._solvers[key] = (schur_chol, upd_j)
        return self._solvers[key]

    def _extend_diags_program(self, nblk: int):
        """Refresh ``nblk`` consecutive diag-stack blocks from the live
        buffer; cached per ``nblk`` with the first block index traced.

        Runs as a shard_map: each device masks out the rows of each
        diagonal block it owns (a block can straddle device boundaries
        when ``rows_local`` is not a multiple of ``block``) and a psum
        assembles the [block, block] tile.  A plain-jit ``dynamic_slice``
        over the row-sharded buffer would make GSPMD replicate the whole
        [n_pad, n_pad] factor on multi-device meshes — an ~N^2-byte
        all-gather per extension, against the bounded-program rules."""
        key = ("extend_diags", nblk)
        if key not in self._solvers:
            axis, rows_local, block = self.axis, self.rows_local, self.block
            repl = NamedSharding(self.mesh, P())

            def upd_diags(l_loc, diags, kb0):
                me = lax.axis_index(axis)
                grow = me * rows_local + jnp.arange(rows_local)

                def body(i, diags):
                    kb = kb0 + i
                    cols = lax.dynamic_slice(
                        l_loc, (0, kb * block), (rows_local, block))
                    rel = grow - kb * block   # row position within block
                    pick = (rel >= 0) & (rel < block)
                    idx = jnp.clip(rel, 0, block - 1)
                    blk = jnp.zeros((block, block), l_loc.dtype)
                    blk = blk.at[idx].add(
                        jnp.where(pick[:, None], cols, 0.0))
                    blk = lax.psum(blk, axis)
                    return lax.dynamic_update_slice(
                        diags, jnp.tril(blk)[None], (kb, 0, 0))

                return lax.fori_loop(0, nblk, body, diags)

            self._solvers[key] = jax.jit(jax.shard_map(
                upd_diags, mesh=self.mesh,
                in_specs=(P(self.axis, None), P(), P()),
                out_specs=P(), check_vma=False),
                donate_argnums=1, out_shardings=repl)
        return self._solvers[key]

    def extend(self, b_scaled: np.ndarray, c_scaled: np.ndarray) -> None:
        """Grow the factored system by ``m`` rows **in place** (online
        data addition) — O(N^2 m) work instead of the O((N+m)^3/3)
        refactorisation, with no extra N^2 memory.

        The new rows fill identity-padded capacity the factor already
        carries (``capacity=`` in the constructor): padding starts at row
        ``n``, so the extension is contiguous and every existing solve
        program stays valid (they close over ``n_pad``/``block`` only).
        For the block factorisation ``M2 = [[M, B^T], [B, C]]``:

        * ``L21 = B L^-T`` — ONE call of the existing block forward-solve
          program with ``B^T`` as the right-hand side;
        * ``L22 = chol(C - L21 L21^T)`` — a single replicated [m, m]
          Cholesky (keep ``m`` per call at ~<=8k; chain ``extend`` calls
          for more);
        * the factor rows [n, n+m) are overwritten in place (donated
          buffer), and only the diagonal blocks covering [n, n+m) are
          re-sliced from the updated buffer.

        ``b_scaled`` [m, n] and ``c_scaled`` [m, m] must be in the SAME
        scaled space as the factored matrix (for an equilibrated factor:
        ``s_new[:, None] * K_new_old * s_old[None, :]`` and
        ``s_new[:, None] * K_new_new * s_new[None, :]`` — the old
        scalings stay frozen; any fixed positive scaling preserves SPD).
        The reference framework has no counterpart: adding data there
        means recomputing the Gram file and re-running the whole LAPACK
        solve (reference: exp_mnist_resnet/classify_gp.py:17-27).
        """
        if self.l_loc is None:
            raise RuntimeError("factorize before extend")
        b_scaled = np.asarray(b_scaled, np.float32)
        c_scaled = np.asarray(c_scaled, np.float32)
        m, nb_cols = b_scaled.shape
        if nb_cols != self.n or c_scaled.shape != (m, m):
            raise ValueError((b_scaled.shape, c_scaled.shape, self.n))
        if self.n + m > self.n_pad:
            raise ValueError(
                f"extend past capacity: n={self.n} + m={m} > "
                f"n_pad={self.n_pad}; construct with capacity>={self.n + m}")
        repl = NamedSharding(self.mesh, P())
        rhs = np.zeros((self.n_pad, m), np.float32)
        rhs[:self.n] = b_scaled.T
        self._extend_core(jax.device_put(rhs, repl),
                          jnp.asarray(c_scaled), m)

    def extend_device(self, w_dev, c_scaled_dev) -> None:
        """:meth:`extend` for cross blocks that ALREADY live on device —
        the host-upload-free path (``extend``'s ``device_put`` of the
        [n_pad, m] right-hand side is its wall-clock bottleneck on
        tunneled runtimes: 134 MB at n=16k/m=2048, the measured reason
        isolated extension ran 0.7x of a refit in round 3).

        ``w_dev`` is the [n_pad, m] scaled cross block ``B^T`` extended
        with zero rows over [n, n_pad) (for an equilibrated factor:
        ``W[i, j] = s_old[i] K(x_i, z_j) s_new[j]``), ``c_scaled_dev``
        the [m, m] scaled new-new block with unit diagonal — e.g.
        assembled by the tile-regeneration sweeps of
        ``parallel.incremental.IncrementalGP._extend_device_blocks``."""
        if self.l_loc is None:
            raise RuntimeError("factorize before extend")
        m = w_dev.shape[1]
        if (w_dev.shape != (self.n_pad, m)
                or c_scaled_dev.shape != (m, m)):
            raise ValueError((w_dev.shape, c_scaled_dev.shape, self.n_pad))
        if self.n + m > self.n_pad:
            raise ValueError(
                f"extend past capacity: n={self.n} + m={m} > "
                f"n_pad={self.n_pad}; construct with capacity>={self.n + m}")
        self._extend_core(w_dev, c_scaled_dev, m)

    def _extend_core(self, rhs_dev, c_dev, m: int) -> None:
        n0, block = self.n, self.block
        # y = L^-1 B^T: zero at the old pad rows (their factor rows are
        # identity and their rhs is zero), so y^T is exactly L21 extended
        # with zero columns over the old padding
        y = self._forward_solve(rhs_dev)

        schur_chol, upd_j = self._extend_programs(m)
        with jax.default_matmul_precision("highest"):
            l22 = schur_chol(y, c_dev)
        # SPD gate BEFORE the donated in-place write: a non-PD Schur
        # complement (duplicate/near-duplicate points, zero jitter) makes
        # lax.linalg.cholesky return NaNs silently, and committing them
        # would irreversibly corrupt the live factor.  Only the [m]
        # diagonal crosses the link.
        d = np.asarray(_diag_j(l22))
        if not np.all(np.isfinite(d)) or np.any(d <= 0.0):
            raise ValueError(
                "extend: the Schur complement of the new rows is not "
                "positive-definite in float32 (duplicate or near-duplicate "
                "training points, or zero jitter?); the live factor is "
                "unchanged")
        with jax.default_matmul_precision("highest"):
            self.l_loc = upd_j(self.l_loc, y, l22, np.int32(n0))

        # refresh the replicated diag stack for the block rows the new
        # data touches (the buffer's diagonal blocks equal lkk exactly --
        # see _factor_step_fn's kept-entries note)
        kb0, kb1 = n0 // block, (n0 + m - 1) // block
        diags_j = self._extend_diags_program(kb1 - kb0 + 1)
        self.diags = diags_j(self.l_loc, self.diags, np.int32(kb0))
        self.n = n0 + m

    def log_diag_sum(self) -> float:
        """``sum(log(diag(L)))`` over the padded factor: the [n_pad]
        diagonal (float32, a few hundred KB at 50k) is fetched and the
        log-sum accumulates in float64 on host — summing ~N float32 logs
        on device would add avoidable rounding on top of the factor's own
        float32 error (and device float64 is only live under the
        never-enabled jax_enable_x64).

        Pad rows contribute exactly 0: identity padding gives them a unit
        diagonal and zero off-diagonals, so their factor diagonal is
        exactly 1.0 in float32 arithmetic (``sqrt(1 - 0)``).  Used for the
        log-determinant term of the GP marginal likelihood
        (``device_large.classify_device_large`` -> ``info["log_evidence"]``).
        """
        if self.diags is None:
            raise RuntimeError("factorize before log_diag_sum")
        if "log_diag_sum" not in self._solvers:
            @jax.jit
            def diag_stack(diags):
                return jnp.diagonal(diags, axis1=1, axis2=2)
            self._solvers["log_diag_sum"] = diag_stack
        d = np.asarray(self._solvers["log_diag_sum"](self.diags),
                       np.float64)
        return float(np.sum(np.log(d)))

    def solve(self, rhs: np.ndarray) -> np.ndarray:
        """(L L^T)^{-1} rhs through the device factor (float32)."""
        nrhs = rhs.shape[1]
        if nrhs not in self._solvers:
            self._solvers[nrhs] = jax.jit(jax.shard_map(
                _solve_fn(self.axis, self.n_pad, self.block,
                          self.rows_local, nrhs),
                mesh=self.mesh, in_specs=(P(self.axis, None), P(), P()),
                out_specs=P(), check_vma=False))
        b = np.zeros((self.n_pad, nrhs), np.float32)
        b[:self.n] = rhs
        repl = NamedSharding(self.mesh, P())
        with jax.default_matmul_precision("highest"):
            a = self._solvers[nrhs](self.l_loc, self.diags,
                                    jax.device_put(b, repl))
        return np.asarray(a)[:self.n]


def cholesky_sharded(k: np.ndarray, mesh: Optional[Mesh] = None,
                     block: int = 512) -> np.ndarray:
    """Blocked mesh Cholesky of an SPD matrix; returns the lower factor
    (float32, on host).  Mainly for tests — the solver path keeps the
    factor on device via ``_ShardedFactor``."""
    if mesh is None:
        mesh = make_mesh()
    f = _ShardedFactor(mesh, k.shape[0], block)
    f.factorize(np.asarray(k, np.float32))
    n = k.shape[0]
    lfull = np.asarray(jax.device_put(
        f.l_loc, NamedSharding(mesh, P())))   # gather local rows
    return np.tril(lfull[:n, :n])


def cholesky_solve_sharded(k: np.ndarray, rhs: np.ndarray,
                           mesh: Optional[Mesh] = None,
                           block: int = 512) -> np.ndarray:
    """One-shot float32 factor + solve (no refinement).  For tests."""
    if mesh is None:
        mesh = make_mesh()
    f = _ShardedFactor(mesh, k.shape[0], block)
    f.factorize(np.asarray(k, np.float32))
    return f.solve(np.asarray(rhs, np.float32))


def chol_solve_dist(kxx: np.ndarray, y: np.ndarray, jitter: float = 0.0,
                    mesh: Optional[Mesh] = None, block: int = 1024,
                    refine_iters: int = 20, tol: float = 1e-10,
                    k_dev=None) -> Tuple[np.ndarray, float, int]:
    """Solve (Kxx + jitter I) A = Y: distributed float32 Cholesky +
    float64 iterative refinement.

    ``kxx`` must be the full (symmetrised) matrix; it is **consumed**
    (equilibrated in place, like ``solve_gp``).  Returns
    ``(A, rel_residual, refinement_iterations)``; ``rel_residual`` is the
    float64 relative residual of the **equilibrated** (Jacobi-scaled)
    system the factor decomposed — the scale-invariant metric for a
    ~1e12-diagonal Gram.  (``chol_solve_ir32`` measures the raw-space
    system instead; the two numbers are not directly comparable.)

    Refinement stops early once the residual reaches ``tol`` or stops
    improving; ``refine_iters`` is a cap, not a target.
    """
    if mesh is None:
        mesh = make_mesh()
    kxx = np.asarray(kxx)
    n = kxx.shape[0]
    y64 = np.asarray(y, np.float64)

    # Jacobi equilibration in float64, in place: Ks = D^-1/2 (K+jI) D^-1/2
    if kxx.dtype != np.float64:
        kxx = kxx.astype(np.float64)
    kxx.flat[:: n + 1] += jitter
    s = 1.0 / np.sqrt(kxx.flat[:: n + 1])
    kxx *= s[:, None]
    kxx *= s[None, :]
    ys = s[:, None] * y64

    factor = _ShardedFactor(mesh, n, block)
    if k_dev is not None:
        # the (raw, unscaled) Gram already lives on device: scale there,
        # skip the host->device upload of the N^2 matrix
        factor.factorize_device(k_dev, s32=s.astype(np.float32))
    else:
        factor.factorize(kxx.astype(np.float32))

    # jitter is already folded into kxx's diagonal (scaled space)
    residual = _blocked_residual_fn(kxx, ys, 0.0)

    def precond(r64):
        return factor.solve(r64.astype(np.float32)).astype(np.float64)

    best_a, best_rel, iters = _ir_solve(precond, residual, ys,
                                        refine_iters, tol)
    return s[:, None] * best_a, best_rel, iters


def variances_from_cross_host(factor: "_ShardedFactor", s: np.ndarray,
                              kzx: np.ndarray, kzz: np.ndarray,
                              chunk: int = 512) -> np.ndarray:
    """GP posterior variances for HOST-resident cross covariances through
    a live equilibrated factor: ``var_z = k_zz - ||L^-1 (s * k_xz)||^2``
    by block forward substitution over bounded column chunks (the
    `device_large._predictive_variances` recipe for store-based
    pipelines, where Kxvx/Kxtx already live on the host as float32).
    ``s`` is the factor's Jacobi scaling (float64 [n]); accuracy floor is
    the float32 factor (~eps32 * k_zz).  The dispatch width is quantised
    to powers of two so varying query counts reuse a handful of compiled
    programs."""
    repl = NamedSharding(factor.mesh, P())
    n, nz = factor.n, len(kzx)
    cb = min(chunk, max(16, 1 << (nz - 1).bit_length()))
    nz_pad = -(-nz // cb) * cb
    w = np.zeros((factor.n_pad, cb), np.float32)
    sums = np.empty(nz_pad, np.float64)
    for c0 in range(0, nz_pad, cb):
        hi = min(c0 + cb, nz)
        w[:n, : hi - c0] = s[:, None] * kzx[c0:hi].T.astype(np.float64)
        if hi - c0 < cb:
            w[:n, hi - c0:] = 0.0
        sums[c0:c0 + cb] = np.asarray(
            factor.forward_sumsq(jax.device_put(w, repl)), np.float64)
    return np.maximum(np.asarray(kzz, np.float64) - sums[:nz], 0.0)


def evidence_from_factor(factor: "_ShardedFactor", s: np.ndarray,
                         y64: np.ndarray, alpha: np.ndarray) -> float:
    """GP log evidence from a live equilibrated factor (the
    `classify_device_large` formula): with ``M = S K' S`` (S = diag(s),
    K' = K + jitter I), ``logdet K' = 2 sum log diag(L_M) - 2 sum log s``;
    the quadratic form reuses the solved ``alpha``.  Float64 oracle:
    `ops.solve.log_marginal_likelihood`."""
    logdet = 2.0 * factor.log_diag_sum() - 2.0 * float(np.sum(np.log(s)))
    n, n_cls = y64.shape
    return float(-0.5 * np.sum(y64 * alpha) - 0.5 * n_cls * logdet
                 - 0.5 * n * n_cls * np.log(2.0 * np.pi))


def chol_solve_ir32(k32: np.ndarray, y: np.ndarray, jitter: float = 0.0,
                    mesh: Optional[Mesh] = None, block: int = 1024,
                    refine_iters: int = 20, tol: float = 1e-10,
                    io_rows: int = 8192, k_dev=None,
                    return_factor: bool = False):
    """Memory-lean large-N variant: solve (K + jitter I) A = Y where ``k32``
    is the full symmetrised **float32** matrix (e.g. straight from the Gram
    store, whose data is float32 anyway — as is the reference's,
    reference: kernel_save_tools.py:13-23).

    Never materialises a float64 copy (half the host footprint of the
    load-as-float64 path: 10 GB instead of 20 at N=50k).  The device factor
    is built from per-shard scaled uploads; refinement residuals are
    computed blockwise in float64 upcasts of the raw float32 rows, so the
    returned solution solves the float64 embedding of the float32 data to
    ``tol`` — identical to upcasting first, without the 2x memory.

    With ``return_factor=True`` returns ``(a, rel, iters, factor, s)``:
    the live `_ShardedFactor` and its float64 Jacobi scalings, for
    posterior variances (`variances_from_cross_host`) and evidence
    (`evidence_from_factor`) without a second factorisation.
    """
    if mesh is None:
        mesh = make_mesh()
    assert k32.dtype == np.float32, k32.dtype
    n = k32.shape[0]
    y64 = np.asarray(y, np.float64)
    d64 = np.ascontiguousarray(np.diagonal(k32)).astype(np.float64) + jitter
    s = 1.0 / np.sqrt(d64)
    s32 = s.astype(np.float32)

    factor = _ShardedFactor(mesh, n, block)
    if k_dev is not None:
        factor.factorize_device(k_dev, s32=s32)
    else:
        factor.factorize_scaled(k32, s32)

    residual = _blocked_residual_fn(k32, y64, jitter, io_rows=io_rows)

    def precond(r64):                         # scaled-space correction
        return s[:, None] * factor.solve(
            (s[:, None] * r64).astype(np.float32)).astype(np.float64)

    a, rel, iters = _ir_solve(precond, residual, y64, refine_iters, tol)
    if return_factor:
        return a, rel, iters, factor, s
    return a, rel, iters


def chol_solve_dist_from_store(store, name: str, y: np.ndarray,
                               jitter: float = 0.0,
                               mesh: Optional[Mesh] = None,
                               block: int = 1024,
                               check_finite: bool = False, **kw):
    """Blocked-I/O classify path (round-1 VERDICT #7): read the
    upper-triangle Gram from the store as float32, mirror it, and solve via
    ``chol_solve_ir32`` — the full float64 Gram (20 GB at 50k) is never
    materialised, unlike the reference's load_kern
    (reference: exp_mnist_resnet/classify_gp.py:45-48,63).  Extra keyword
    arguments (e.g. ``return_factor=True``) pass through.

    ``check_finite=True`` refuses a NaN-holed Gram (an unmerged worker
    shard) from the in-memory copy — one ~seconds pass over data already
    resident, where a store-level ``assert_complete`` scan costs a SECOND
    full read+decompress of the N^2 dataset (a measured multi-minute leg
    of the 50k classify wall)."""
    from ..ops.solve import symmetrize_from_upper
    k32 = symmetrize_from_upper(store.read(name))       # ONE float32 copy
    if check_finite and np.isnan(k32).any():
        raise RuntimeError(
            f"{name} has NaN holes (incomplete or unmerged assembly?); "
            f"rerun assembly — tile-level resume will skip finished tiles")
    return chol_solve_ir32(k32, y, jitter=jitter, mesh=mesh, block=block,
                           **kw)


_TRIL_IDX_CACHE = {}


def _mirror_rows_tiled(k32, r0: int, r1: int, ts: int = 1024) -> None:
    """Fill the lower-triangle columns of rows [r0:r1) from the upper
    triangle already resident in ``k32`` (rows [0:r1) read so far), in
    [ts, ts] transposed tiles.  One big strided ``.T`` assignment plus a
    ``triu_indices`` fancy-indexed in-block mirror measured 22.5 s at
    16k (~half the producer wall, ~210 s extrapolated at 50k); tiled
    transposes are ~13x faster on the diag block and keep both source
    and destination runs cache-resident."""
    # cross-block: [r0:r1, :r0] from [:r0, r0:r1].T
    for j0 in range(0, r0, ts):
        j1 = min(j0 + ts, r0)
        k32[r0:r1, j0:j1] = k32[j0:j1, r0:r1].T
    # in-block: strictly-lower tiles from their upper mirrors
    for i0 in range(r0, r1, ts):
        i1 = min(i0 + ts, r1)
        for j0 in range(r0, i0, ts):
            j1 = min(j0 + ts, r1)
            k32[i0:i1, j0:j1] = k32[j0:j1, i0:i1].T
        d = k32[i0:i1, i0:i1]              # diagonal tile
        m = i1 - i0
        il = _TRIL_IDX_CACHE.get(m)
        if il is None:
            il = np.tril_indices(m, -1)
            _TRIL_IDX_CACHE[m] = il
        d[il] = d.T[il]


def chol_solve_stream_from_store(store, name: str, y: np.ndarray,
                                 jitter: float = 0.0,
                                 mesh: Optional[Mesh] = None,
                                 block: int = 1024, io_rows: int = 8192,
                                 refine_iters: int = 20, tol: float = 1e-10,
                                 check_finite: bool = True,
                                 return_factor: bool = False,
                                 verbose: bool = False):
    """Streamed classify path (round-4 VERDICT item 3): the store
    pipeline's host legs — row-block read+decompress, symmetrisation,
    NaN scan, host->device upload — previously ran strictly in sequence
    (~325 s of the 963 s 50k classify leg).  Here a producer thread
    streams row blocks out of the store (mirroring each block's upper
    triangle down as it lands, so rows complete top-to-bottom) while the
    main thread uploads completed rows to the device factor buffer; the
    NaN refusal becomes one elementwise reduce over the uploaded device
    buffer (~free) instead of a 30 s host pass, and Jacobi scaling is
    applied ON DEVICE once the full diagonal has streamed past
    (`_ShardedFactor.factorize_padded_scaled`) — the upload cannot wait
    for it.  Outputs match `chol_solve_dist_from_store` to float32
    rounding (the scaling multiplies in a different association:
    ``(k*s_i)*s_j`` on host vs ``k*(s_i*s_j)`` on device — ≤1 ulp per
    entry) and the same float64 host residual/IR loop then drives both
    to the same tolerance against the same retained host copy.
    (Reference counterpart: the strictly serial load_kern + scipy solve,
    reference: exp_mnist_resnet/classify_gp.py:45-48,63.)

    Returns ``(a, rel, iters)`` or, with ``return_factor``,
    ``(a, rel, iters, factor, s)`` exactly as `chol_solve_ir32`.
    """
    import threading

    if mesh is None:
        mesh = make_mesh()
    n, n2 = store.shape(name)
    if n != n2:
        raise ValueError(f"{name} is not square: {(n, n2)}")
    y64 = np.asarray(y, np.float64)
    k32 = np.empty((n, n), np.float32)    # host copy kept for IR residuals
    factor = _ShardedFactor(mesh, n, block)
    n_pad = factor.n_pad

    cond = threading.Condition()
    done_rows = [0]
    fail = []

    def producer():
        try:
            for r0 in range(0, n, io_rows):
                r1 = min(r0 + io_rows, n)
                store.read_rows(name, r0, r1, out=k32[r0:r1])
                _mirror_rows_tiled(k32, r0, r1)
                with cond:
                    done_rows[0] = r1
                    cond.notify_all()
        except BaseException as e:          # surface in the consumer
            fail.append(e)
            with cond:
                done_rows[0] = n
                cond.notify_all()

    def make_rows(r0, r1):
        need = min(r1, n)
        with cond:
            while done_rows[0] < need:
                cond.wait()
        if fail:
            raise fail[0]
        out = np.zeros((r1 - r0, n_pad), np.float32)
        if r0 < n:
            hi = min(r1, n)
            out[:hi - r0, :n] = k32[r0:hi]
        pad = np.arange(max(r0, n), r1)     # identity padding rows only:
        out[pad - r0, pad] = 1.0            # real rows scale on device
        return out

    t0 = time.perf_counter()
    th = threading.Thread(target=producer, daemon=True)
    th.start()
    k_dev = factor._upload_rows(make_rows)
    th.join()
    if fail:
        raise fail[0]
    if check_finite:
        # holes stream through to the device buffer; one reduce there
        # replaces the multi-ten-second host isnan pass
        if bool(np.asarray(jnp.isnan(k_dev).any())):
            raise RuntimeError(
                f"{name} has NaN holes (incomplete or unmerged "
                f"assembly?); rerun assembly — tile-level resume will "
                f"skip finished tiles")
    if verbose:
        print(f"[stream] read+mirror+upload overlapped: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    d64 = np.ascontiguousarray(np.diagonal(k32)).astype(np.float64) + jitter
    s = 1.0 / np.sqrt(d64)
    factor.factorize_padded_scaled(k_dev, s.astype(np.float32))

    residual = _blocked_residual_fn(k32, y64, jitter, io_rows=io_rows)

    def precond(r64):
        return s[:, None] * factor.solve(
            (s[:, None] * r64).astype(np.float32)).astype(np.float64)

    a, rel, iters = _ir_solve(precond, residual, y64, refine_iters, tol)
    if return_factor:
        return a, rel, iters, factor, s
    return a, rel, iters
