"""Distributed GP solve: preconditioned conjugate gradients over the mesh.

The reference solves Kxx^-1 Y with single-process CPU LAPACK (reference:
exp_mnist_resnet/classify_gp.py:17-27), which caps N at what one host's RAM
and O(N^3) tolerate.  The TPU-native large-N path is matrix-free block CG
(the GPyTorch/BBMM recipe): the Gram is **row-sharded** over the mesh, the
hot op is the matmul ``K @ V`` (MXU), and GSPMD inserts the all-gathers /
reductions implied by the shardings.  A Jacobi preconditioner tames the
huge diagonal scale of NNGP Grams (paper configs reach ~1e12).

All right-hand sides (the 10 one-hot columns) are solved simultaneously;
per-column step sizes keep the math exactly column-independent CG.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

__all__ = ["cg_solve_sharded"]


@functools.partial(jax.jit, static_argnames=("maxiter",))
def _cg(k, y, jitter, tol, maxiter):
    diag = jnp.diagonal(k) + jitter
    minv = (1.0 / diag)[:, None]

    def mv(v):
        return k @ v + jitter * v

    x = jnp.zeros_like(y)
    r = y
    z = minv * r
    p = z
    rz = jnp.sum(r * z, axis=0)
    y_norm = jnp.linalg.norm(y, axis=0)

    def cond(state):
        _, r, *_rest, it = state
        rel = jnp.linalg.norm(r, axis=0) / y_norm
        return jnp.logical_and(it < maxiter, jnp.max(rel) > tol)

    def body(state):
        x, r, p, rz, it = state
        kp = mv(p)
        alpha = rz / jnp.sum(p * kp, axis=0)
        x = x + alpha * p
        r = r - alpha * kp
        z = minv * r
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, r, _, _, iters = lax.while_loop(cond, body, (x, r, p, rz, 0))
    rel = jnp.max(jnp.linalg.norm(r, axis=0) / y_norm)
    return x, rel, iters


def cg_solve_sharded(kxx: np.ndarray, y: np.ndarray, jitter: float = 0.0,
                     mesh: Optional[Mesh] = None, tol: float = 1e-6,
                     maxiter: int = 2000, dtype=None):
    """Solve (Kxx + jitter*I) A = Y with mesh-sharded CG.

    ``kxx`` must be the full (symmetrised) matrix.  Returns
    (A, rel_residual, iterations).
    """
    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    n = kxx.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:  # identity-extend so rows shard evenly; solution is unaffected
        kxx = np.pad(np.asarray(kxx), ((0, pad), (0, pad)))
        kxx[np.arange(n, n + pad), np.arange(n, n + pad)] = 1.0
        y = np.pad(np.asarray(y), ((0, pad), (0, 0)))

    row = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())
    k_d = jax.device_put(jnp.asarray(kxx, dtype), row)
    y_d = jax.device_put(jnp.asarray(y, dtype), repl)
    # full f32 matvec precision: TPU's default bf16 accumulation stalls or
    # diverges CG on ill-conditioned Grams (measured at 4k, BASELINE.md)
    with jax.default_matmul_precision("highest"):
        x, rel, iters = _cg(k_d, y_d, jnp.asarray(jitter, dtype),
                            jnp.asarray(tol, dtype), maxiter)
    # GSPMD leaves the iterate row-sharded (it inherits the Jacobi
    # preconditioner's sharding, cut from the row-sharded Gram diagonal);
    # regather it replicated BEFORE the host fetch — row shards on other
    # PROCESSES are not addressable on a multi-controller fleet
    # (tests/_fleet_solve_worker.py), and the fetch would have paid the
    # same all-gather anyway
    x = jax.jit(lambda a: a, out_shardings=repl)(x)
    return np.asarray(x)[:n], float(rel), int(iters)
