"""Blockwise Gram-matrix assembly.

TPU-native replacement for the reference's per-process DataLoader block loop
(reference: cnn_gp/data.py:36-126, cnn_gp/kernel_save_tools.py:26-58).
Design:

* The dataset lives **on device** once (MNIST 60k is ~180 MB); each tile is
  a ``lax.dynamic_slice`` inside one jitted program whose only traced
  inputs are the (row, col) offsets -- a single compilation serves every
  tile, including diagonal ones, because the same-example fix-up is driven
  by a global-index mask rather than a ``same`` flag (the reference
  compiles -- in spirit -- two code paths and restarts host DataLoaders per
  row, reference: cnn_gp/data.py:83-96).
* Dispatch is asynchronous: a small queue of in-flight device results
  overlaps TPU compute with host-side HDF5 writes.
* Work distribution across workers/hosts reuses the reference's contiguous
  span semantics (parallel/scheduler.py), so shard files merge
  identically; tile-level resume skips completed tiles.

``save_K`` mirrors the reference driver helper of the same name.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import settings
from ..kernels import apply_kernel
from ..utils.timing import print_timings
from . import scheduler

__all__ = ["compute_gram", "compute_gram_diag", "save_K", "gram_in_memory"]


@functools.partial(jax.jit,
                   static_argnames=("b", "symmetric", "snap"))
def _tile_jit(model, x_all, z_all, i0, j0, b, symmetric, snap):
    del snap
    x = lax.dynamic_slice_in_dim(x_all, i0, b)
    z = lax.dynamic_slice_in_dim(z_all, j0, b)
    mask = None
    if symmetric:
        rows = i0 + jnp.arange(b)
        cols = j0 + jnp.arange(b)
        mask = rows[:, None] == cols[None, :]
    return apply_kernel(model, x, z, False, False, mask)


@functools.partial(jax.jit, static_argnames=("b", "symmetric", "snap"))
def _diag_tile_jit(model, x_all, z_all, i0, b, symmetric, snap):
    del snap
    x = lax.dynamic_slice_in_dim(x_all, i0, b)
    z = lax.dynamic_slice_in_dim(z_all, i0, b)
    return apply_kernel(model, x, z, symmetric, True)


def _pad_to_multiple(x: np.ndarray, b: int) -> np.ndarray:
    n = len(x)
    rem = (-n) % b
    if rem == 0:
        return x
    pad = np.zeros((rem,) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad])


class _WriteQueue:
    """Bounded queue of in-flight device results; overlaps device compute
    with host writes."""

    def __init__(self, write, depth: int = 4):
        self.write = write
        self.depth = depth
        self.pending = []

    def push(self, item):
        self.pending.append(item)
        while len(self.pending) > self.depth:
            self._drain_one()

    def _drain_one(self):
        i0, j0, ni, nj, dev = self.pending.pop(0)
        self.write(i0, j0, np.asarray(dev)[:ni, :nj])

    def flush(self):
        while self.pending:
            self._drain_one()


def compute_gram(model, X, Z=None, *, batch_size: int = 200,
                 store=None, name: Optional[str] = None,
                 worker_rank: int = 0, n_workers: int = 1,
                 order: str = "contiguous", out: Optional[np.ndarray] = None,
                 symmetrize_out: bool = True, progress: bool = True,
                 print_interval: float = 2.0, desc: Optional[str] = None):
    """Assemble a Gram matrix blockwise.

    Z=None computes the symmetric upper triangle of K(X, X) (the layout the
    GP solve consumes, reference: cnn_gp/data.py:22-29 +
    exp_mnist_resnet/classify_gp.py:24-27).  Results go to ``store[name]``
    (HDF5, resumable) and/or an in-memory ``out`` array.

    Returns the ``out`` array if one was used, else None.
    """
    symmetric = Z is None
    n1 = len(X)
    n2 = n1 if symmetric else len(Z)
    b = batch_size

    manifest = scheduler.worker_manifest(n1, n2, b, symmetric, worker_rank,
                                         n_workers, order)
    if store is not None:
        assert name is not None
        store.create(name, n1, n2, b)
        manifest = np.asarray(
            [t for t in manifest
             if not store.tile_done(name, int(t[1]) * b, int(t[2]) * b)],
            dtype=np.int32).reshape(-1, 3)
    if out is None and store is None:
        out = np.full((n1, n2), np.nan, np.float32)

    x_all = jax.device_put(_pad_to_multiple(np.asarray(X, np.float32), b))
    z_all = x_all if symmetric else jax.device_put(
        _pad_to_multiple(np.asarray(Z, np.float32), b))

    def write(i0, j0, block):
        if store is not None:
            store.write_tile(name, i0, j0, block)
        if out is not None:
            out[i0:i0 + block.shape[0], j0:j0 + block.shape[1]] = block
            if symmetric and symmetrize_out and i0 != j0:
                out[j0:j0 + block.shape[1], i0:i0 + block.shape[0]] = block.T

    queue = _WriteQueue(write)
    it = iter(manifest)
    if progress:
        it = print_timings(it, desc=desc or (name or "gram"),
                           print_interval=print_interval,
                           total=len(manifest))
    snap = settings.snapshot()
    for _, ti, tj in it:
        i0, j0 = int(ti) * b, int(tj) * b
        dev = _tile_jit(model, x_all, z_all, i0, j0, b, symmetric, snap)
        queue.push((i0, j0, min(b, n1 - i0), min(b, n2 - j0), dev))
    queue.flush()
    return out


def compute_gram_diag(model, X, Z=None, *, batch_size: int = 200,
                      store=None, name: Optional[str] = None,
                      progress: bool = True, print_interval: float = 2.0):
    """Diagonal-only kernel k(x_i, z_i) (reference: cnn_gp/data.py:99-126)."""
    symmetric = Z is None
    n = len(X)
    b = min(batch_size, n)
    x_all = jax.device_put(_pad_to_multiple(np.asarray(X, np.float32), b))
    z_all = x_all if symmetric else jax.device_put(
        _pad_to_multiple(np.asarray(Z, np.float32), b))
    if store is not None:
        assert name is not None
        store.create(name, n, None, b, diag=True)
    offsets = [i for i in range(0, n, b)
               if store is None or not store.tile_done(name, i, None)]
    # resume: start from the stored values so skipped tiles are not NaN
    n_tiles_total = len(range(0, n, b))
    out = (store.read(name)
           if store is not None and len(offsets) < n_tiles_total
           else np.full(n, np.nan, np.float32))
    if store is not None and not offsets:
        return out
    if progress:
        offsets = print_timings(iter(list(offsets)), desc=name or "diag",
                                print_interval=print_interval,
                                total=len(offsets))
    snap = settings.snapshot()
    for i0 in offsets:
        dev = _diag_tile_jit(model, x_all, z_all, i0, b, symmetric, snap)
        block = np.asarray(dev)[:min(b, n - i0)]
        out[i0:i0 + len(block)] = block
        if store is not None:
            store.write_tile(name, i0, None, block)
    return out


def save_K(store, model, name: str, X, X2, diag: bool, batch_size: int,
           worker_rank: int = 0, n_workers: int = 1,
           print_interval: float = 2.0):
    """Driver-level helper mirroring the reference's ``save_K`` signature
    (reference: cnn_gp/kernel_save_tools.py:26-58), with tile-level resume
    instead of skip-if-name-exists."""
    x = X.images if hasattr(X, "images") else X
    x2 = X2.images if (X2 is not None and hasattr(X2, "images")) else X2
    if diag:
        compute_gram_diag(model, x, x2, batch_size=batch_size, store=store,
                          name=name, print_interval=print_interval)
    else:
        compute_gram(model, x, x2, batch_size=batch_size, store=store,
                     name=name, worker_rank=worker_rank,
                     n_workers=n_workers, print_interval=print_interval,
                     desc=f"{name} (worker {worker_rank}/{n_workers})")


def gram_in_memory(model, X, Z=None, **kw) -> np.ndarray:
    """Convenience: full (symmetrised) Gram as a numpy array."""
    x = X.images if hasattr(X, "images") else X
    z = Z.images if (Z is not None and hasattr(Z, "images")) else Z
    n1 = len(x)
    n2 = n1 if z is None else len(z)
    out = np.full((n1, n2), np.nan, np.float32)
    compute_gram(model, x, z, out=out, **kw)
    return out
