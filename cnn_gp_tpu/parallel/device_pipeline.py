"""Device-resident Gram assembly and classification.

The streaming engine (parallel/gram.py) fetches tiles to the host for the
HDF5/Zarr store -- right for checkpointed multi-worker runs, but for
in-memory workflows every fetch pays host-link latency (110 ms round trip
on tunneled runtimes).  Here the *entire* Gram matrix is assembled on
device in one jitted program -- a `lax.scan` over the upper-triangle tile
manifest scattering each block (and its mirror) with
`dynamic_update_slice` -- and can be consumed by the on-device solvers
without ever visiting the host:

    K = gram_device(model, x)                       # [N, N] on device
    acc = classify_device(model, xtr, ytr, xte, yte)  # one host download

Memory: the device Gram is N^2 * 4 bytes (1 GB at N=16k) on top of the
tile working set.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import settings
from . import scheduler
from .gram import _pad_to_multiple, _tile_body

__all__ = ["gram_device", "classify_device"]


@functools.partial(jax.jit,
                   static_argnames=("b", "symmetric", "n_pad", "snap"))
def _assemble_jit(model, x_all, z_all, offsets, b, symmetric, n_pad, snap):
    del snap
    n1_pad, n2_pad = n_pad

    def body(k, off):
        i0, j0 = off[0], off[1]
        blk = _tile_body(model, x_all, z_all, i0, j0, b, symmetric)
        k = lax.dynamic_update_slice(k, blk, (i0, j0))
        if symmetric:
            # mirror into the lower triangle; diagonal tiles overwrite
            # themselves with their own transpose-symmetric values
            k = lax.dynamic_update_slice(k, blk.T, (j0, i0))
        return k, None

    k0 = jnp.zeros((n1_pad, n2_pad), jnp.float32)
    k, _ = lax.scan(body, k0, offsets)
    return k


def gram_device(model, X, Z=None, *, batch_size: int = 128) -> jax.Array:
    """Full (symmetrised when Z is None) Gram matrix, resident on device."""
    symmetric = Z is None
    n1 = len(X)
    n2 = n1 if symmetric else len(Z)
    b = batch_size
    x_np = _pad_to_multiple(np.asarray(X, np.float32), b)
    z_np = x_np if symmetric else _pad_to_multiple(
        np.asarray(Z, np.float32), b)
    manifest = scheduler.worker_manifest(n1, n2, b, symmetric)
    offsets = jnp.asarray(manifest[:, 1:3].astype(np.int32) * b)
    k = _assemble_jit(model, jnp.asarray(x_np), jnp.asarray(z_np), offsets,
                      b, symmetric, (len(x_np), len(z_np)),
                      settings.snapshot())
    return k[:n1, :n2]


@jax.jit
def _solve_predict_jit(kxx, y_onehot, kzx_stack, jitter):
    # scale-normalise for float32 conditioning (pure row/col scaling)
    s = jnp.mean(jnp.diagonal(kxx))
    k = kxx / s + jitter * jnp.eye(kxx.shape[0], dtype=kxx.dtype)
    chol = jnp.linalg.cholesky(k)
    a = jax.scipy.linalg.cho_solve((chol, True), y_onehot)
    return [jnp.argmax(kzx / s @ a, axis=1) for kzx in kzx_stack]


def classify_device(model, train_x, train_y, *splits,
                    batch_size: int = 128, jitter: float = 1e-6,
                    refine: bool = True, variances: bool = False):
    """GP classification with the Gram never leaving the device.

    ``splits`` are (x, labels) pairs; returns a list of accuracies.
    With ``refine=False`` everything stays float32 on device; with
    ``refine`` the float32 solution gets float64 host refinement using
    one download of Kxx (still no re-upload).

    With ``variances=True`` returns ``(accuracies, variances)`` where the
    second element holds per-split GP posterior variances
    ``k_zz - k_zx (Kxx + jitter*mean(diag)*I)^-1 k_xz`` computed on
    device through the resident factor (float64 oracle:
    ``ops.solve.predictive_variance``; large-N matrix-free path:
    ``classify_device_large(variances=True)``).
    """
    from ..ops import solve

    n_classes = int(np.max(train_y)) + 1
    y = jnp.asarray(solve.one_hot_targets(train_y, n_classes, np.float32))
    kxx = gram_device(model, train_x, batch_size=batch_size)
    kzx = [gram_device(model, x, train_x, batch_size=batch_size)
           for x, _ in splits]

    def _variances(chol, s):
        out = []
        for (xz, _), kzx_dev in zip(splits, kzx):
            xz = np.asarray(xz, np.float32)
            kzz = np.concatenate(
                [np.asarray(model(xz[i:i + batch_size], diag=True))
                 for i in range(0, len(xz), batch_size)])
            out.append(np.asarray(_variance_jit(
                chol, kzx_dev, jnp.asarray(kzz), s)))
        return out

    if not refine:
        if not variances:
            preds = _solve_predict_jit(kxx, y, kzx, jitter)
            return [float(np.mean(np.asarray(p) == np.asarray(lbl)))
                    for p, (_, lbl) in zip(preds, splits)]
        # one factorisation serves predictions AND variances (the fused
        # _solve_predict_jit would factor a second time)
        s = float(np.asarray(jnp.mean(jnp.diagonal(kxx))))
        chol = _normalize_and_factor(kxx, s, jitter)
        preds = _predict_from_factor_jit(chol, y, kzx, s)
        accs = [float(np.mean(np.asarray(p) == np.asarray(lbl)))
                for p, (_, lbl) in zip(preds, splits)]
        return accs, _variances(chol, s)
    # float64 quality: factor the *resident* Kxx on device (no re-upload),
    # download it once for the float64 residual refinement on host
    s = float(np.asarray(jnp.mean(jnp.diagonal(kxx))))
    chol = _normalize_and_factor(kxx, s, jitter)
    kxx_h = np.asarray(kxx, np.float64) / s
    solve.diag_add(kxx_h, jitter)
    a = solve.refine_with_factor(chol, kxx_h,
                                 solve.one_hot_targets(train_y, n_classes))
    accs = [solve.accuracy(
        solve.predict(np.asarray(k, np.float64) / s, a), lbl)
        for k, (_, lbl) in zip(kzx, splits)]
    return (accs, _variances(chol, s)) if variances else accs


@jax.jit
def _predict_from_factor_jit(chol, y_onehot, kzx_stack, s):
    a = jax.scipy.linalg.cho_solve((chol, True), y_onehot)
    return [jnp.argmax(kzx / s @ a, axis=1) for kzx in kzx_stack]


@jax.jit
def _variance_jit(chol, kzx, kzz_diag, s):
    """Posterior variances through the normalised factor:
    ``K + jitter*s*I = s * (L_n L_n^T)``, so the quadratic form is
    ``(1/s) * || L_n^-1 k_xz ||^2``."""
    with jax.default_matmul_precision("highest"):
        v = jax.scipy.linalg.solve_triangular(chol, kzx.T, lower=True)
        return jnp.maximum(kzz_diag - jnp.sum(v * v, axis=0) / s, 0.0)


@jax.jit
def _normalize_and_factor(kxx, s, jitter):
    k = kxx / s + jitter * jnp.eye(kxx.shape[0], dtype=kxx.dtype)
    return jnp.linalg.cholesky(k)
