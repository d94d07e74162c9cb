"""Posterior persistence and serving: solve once, predict from any process.

No reference counterpart: the reference's only persisted artifact is the
Gram HDF5, so EVERY prediction process must re-run the full O(N^3) host
LAPACK solve before it can score a single point (reference:
exp_mnist_resnet/classify_gp.py:17-27 — ~45 min at N=50k on this host's
single core; the reference's own run log, classify_gp.py:82-91, is one
such re-solve).  Here the solved GP posterior is O(N) objects — weights
``alpha`` [N, C], Jacobi equilibration scalings ``s`` [N], and the
training inputs — saved once (``save_posterior``) and served by any
process immediately (``GPPredictor``):

* **means/classification**: ``K(z, X) @ alpha`` via bounded
  tile-regeneration sweeps (`parallel.device_large.scores_regen`) — no
  solve, no stored Gram, nothing O(N^2) anywhere, identical predictions
  to the run that produced the posterior;
* **variances**: after ONE solve-free rebuild of the device factor
  (``prepare_variances``: reassemble the equilibrated Gram from the
  stored inputs+scalings straight into the factor buffer and refactorise
  — assembly+factor cost only, no refinement sweeps), matrix-free
  posterior variances per query block exactly as
  ``classify_device_large(variances=True)`` computes them.

The artifact is a flat .npz (float32 inputs, float64 posterior) with a
format version and the kernel-lowering settings snapshot recorded for
provenance.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import numpy as np

from . import settings

__all__ = ["save_posterior", "load_posterior", "GPPredictor", "Posterior"]

FORMAT_VERSION = 1
_FACTOR_CACHE_VERSION = 2   # v2: meta gained model_sha256 (hyperparameter
# leaves) — a v1 cache cannot prove which model's kernel it factored


@dataclasses.dataclass
class Posterior:
    """A solved GP posterior: everything needed to serve new queries."""
    train_x: np.ndarray                 # [N, C, H, W] float32
    alpha: np.ndarray                   # [N, n_classes] float64
    scalings: Optional[np.ndarray]      # [N] float64 (None: means only)
    jitter_raw: float                   # provenance; folded into scalings
    config_name: str
    settings_snapshot: str              # lowering settings at solve time

    @property
    def n(self) -> int:
        return len(self.train_x)


def save_posterior(path, *, train_x, alpha, scalings=None,
                   jitter_raw: float = 0.0, config_name: str = "") -> str:
    """Persist a solved posterior (e.g. from ``classify_device_large``'s
    ``info["alpha"]/info["scalings"]/info["jitter_raw"]``) to ``path``.

    ``scalings`` is optional but required later for variance serving —
    the equilibrated factor is rebuilt from it.  Returns the final path
    (``.npz`` appended if missing, mirroring ``np.savez``)."""
    path = str(path)
    if not path.endswith(".npz"):
        path += ".npz"
    train_x = np.asarray(train_x, np.float32)
    alpha = np.asarray(alpha, np.float64)
    if alpha.ndim != 2:
        raise ValueError(f"alpha must be [N, n_classes], got shape "
                         f"{alpha.shape}")  # fail here, not at serve time
    if len(train_x) != len(alpha):
        raise ValueError(f"train_x/alpha length mismatch: "
                         f"{len(train_x)} vs {len(alpha)}")
    arrays = {
        "format_version": np.int64(FORMAT_VERSION),
        "train_x": train_x,
        "alpha": alpha,
        "jitter_raw": np.float64(jitter_raw),
        "config_name": np.str_(config_name),
        "settings_snapshot": np.str_(repr(settings.snapshot())),
    }
    if scalings is not None:
        scalings = np.asarray(scalings, np.float64)
        if scalings.shape != (len(train_x),):
            raise ValueError(f"scalings shape {scalings.shape} != "
                             f"({len(train_x)},)")
        arrays["scalings"] = scalings
    np.savez(path, **arrays)
    return path


def load_posterior(path) -> Posterior:
    with np.load(str(path), allow_pickle=False) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"posterior format {version} is newer than "
                             f"this library's {FORMAT_VERSION}")
        return Posterior(
            train_x=z["train_x"],
            alpha=z["alpha"],
            scalings=z["scalings"] if "scalings" in z.files else None,
            jitter_raw=float(z["jitter_raw"]),
            config_name=str(z["config_name"]),
            settings_snapshot=str(z["settings_snapshot"]),
        )


class GPPredictor:
    """Serve a persisted posterior: means immediately, variances after a
    solve-free factor rebuild.

    ``batch_size`` is the Gram tile size for the regeneration sweeps; the
    run that produced the posterior used its own — predictions are
    identical when they match and equal to float32 accumulation order
    otherwise.

    Construction refuses a posterior whose recorded kernel-lowering
    settings snapshot differs from the process's current
    ``settings.snapshot()``: alpha was solved against THAT kernel, and
    regenerating ``K(z, X)`` under different lowering (e.g. exact vs
    poly arccos) silently shifts near-tie classifications.  Pass
    ``allow_settings_mismatch=True`` after deliberately matching the
    numerics (the deviations are bounded <5e-7 — see
    ``cnn_gp_tpu.settings``)."""

    def __init__(self, model, posterior: Posterior, batch_size: int = 128,
                 allow_settings_mismatch: bool = False):
        current = repr(settings.snapshot())
        if (not allow_settings_mismatch and posterior.settings_snapshot
                and posterior.settings_snapshot != current):
            raise ValueError(
                f"posterior was solved under kernel-lowering settings "
                f"{posterior.settings_snapshot} but this process has "
                f"{current}; align cnn_gp_tpu.settings (or pass "
                f"allow_settings_mismatch=True)")
        self.model = model
        self.posterior = posterior
        self.batch_size = batch_size
        self._factor = None
        self._var_ctx = None
        self._scores_fn = None

    def scores(self, z) -> np.ndarray:
        """Posterior mean scores ``K(z, X_train) @ alpha`` per class, via
        bounded tile-regeneration sweeps (nothing O(N^2) resident).  The
        training set and weights are uploaded once, on the first call."""
        if self._scores_fn is None:
            from .parallel.device_large import make_scores_fn
            self._scores_fn = make_scores_fn(
                self.model, self.posterior.train_x,
                self.posterior.alpha.astype(np.float32),
                batch_size=self.batch_size)
        return self._scores_fn(np.asarray(z, np.float32))

    def classify(self, z) -> np.ndarray:
        return np.argmax(self.scores(z), axis=1)

    def prepare_variances(self, mesh=None, block: int = 2048,
                          factor_cache: Optional[str] = None,
                          write_cache: bool = True) -> None:
        """Rebuild the device factor from the stored training set and
        equilibration scalings: assembly + blocked in-place Cholesky, NO
        solve or refinement (the posterior is already solved).  Required
        once per process before :meth:`variances`; ~assembly-pass cost
        (BASELINE.md: 241s assemble + 12s factor at N=50k vs 1000s+ for
        the full classify run this replaces).

        ``factor_cache`` (opt-in) names a DIRECTORY holding the factor as
        an O(N^2) float32 file (~1 GB at 16k, ~10 GB at 50k — clearly a
        disk-for-compute trade): when present and matching this
        posterior/geometry, the factor is loaded+uploaded instead of
        reassembled and refactorised; when absent, it is written after
        the rebuild (``write_cache=False`` disables that).  Measured on
        the real chip at N=16,384 (BASELINE.md "Serving: on-disk factor
        cache"): loading is **12.1 s vs 42.9 s** for the solve-free
        rebuild — the chunked upload sustains ~90 MB/s even through the
        tunnel, and on a directly attached TPU (~GB/s H2D) it is
        seconds.  The one-time WRITE pass costs extra (~121 s at 16k:
        fetch the N^2 triangle to host + disk), so the cache pays off
        from the second process onward.  A cache whose geometry or
        posterior hash mismatches is refused (stale factors silently
        produce wrong variances)."""
        from .parallel.device_large import rebuild_factor

        p = self.posterior
        if p.scalings is None:
            raise ValueError("posterior was saved without scalings; "
                             "variance serving needs them (save_posterior"
                             "(..., scalings=info['scalings']))")
        if factor_cache and self._try_load_factor_cache(factor_cache, mesh,
                                                        block):
            return
        factor, x_all, s_dev = rebuild_factor(
            self.model, p.train_x, p.scalings,
            batch_size=self.batch_size, block=block, mesh=mesh)
        self._factor = factor
        # pin the lowering snapshot at rebuild time: the variance sweeps
        # must whiten cross-columns of the SAME kernel the factor holds
        self._var_ctx = (x_all, s_dev, settings.snapshot())
        if factor_cache and write_cache:
            self._write_factor_cache(factor_cache)

    def _cache_meta(self, block: int, n_devices: int) -> dict:
        """Identity of a factor cache: the posterior content (scalings +
        training-set digest), the model's array leaves (fitted
        hyperparameters — scalings alone cannot distinguish models whose
        change preserves diag K, e.g. a Mixture-logit reweighting of
        equal-diagonal components), the factor geometry, and the
        lowering snapshot — any mismatch means the cached factor
        decomposed a DIFFERENT matrix."""
        import jax

        p = self.posterior
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(p.scalings).tobytes())
        h.update(np.ascontiguousarray(p.train_x).tobytes())
        mh = hashlib.sha256()
        for kp, v in jax.tree_util.tree_flatten_with_path(self.model)[0]:
            mh.update(jax.tree_util.keystr(kp).encode())
            mh.update(np.ascontiguousarray(v).tobytes())
        return {
            "version": _FACTOR_CACHE_VERSION,
            "n": p.n,
            "block": int(block),
            "batch_size": int(self.batch_size),
            "n_devices": int(n_devices),
            "posterior_sha256": h.hexdigest(),
            "model_sha256": mh.hexdigest(),
            "settings_snapshot": repr(settings.snapshot()),
        }

    def _try_load_factor_cache(self, path, mesh, block: int) -> bool:
        """Load a previously written factor cache; False if absent.
        Raises on a PRESENT but mismatched cache — silently rebuilding
        would hide that the expensive file on disk is stale."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.chol_dist import _ShardedFactor
        from .parallel.device_large import _pad_to_multiple
        from .parallel.mesh import make_mesh

        meta_p = os.path.join(path, "meta.json")
        if not os.path.exists(meta_p):
            return False
        with open(meta_p) as fh:
            meta = json.load(fh)
        if mesh is None:
            mesh = make_mesh()
        want = self._cache_meta(block, mesh.devices.size)
        if meta != want:
            bad = [k for k in want if meta.get(k) != want[k]]
            raise ValueError(
                f"factor cache at {path} does not match this posterior/"
                f"geometry (mismatched: {bad}); delete it or pass the "
                f"matching block/batch_size/mesh")
        p = self.posterior
        f = _ShardedFactor(mesh, p.n, block, pad_to=self.batch_size)
        l_mm = np.lib.format.open_memmap(os.path.join(path, "l.npy"),
                                         mode="r")
        if l_mm.shape != (f.n_pad, f.n_pad):
            raise ValueError(f"factor cache shape {l_mm.shape} != computed "
                             f"n_pad {f.n_pad}")
        f.l_loc = f._upload_rows(lambda r0, r1: l_mm[r0:r1])
        f.diags = jax.device_put(np.load(os.path.join(path, "diags.npy")),
                                 NamedSharding(mesh, P()))
        self._factor = f
        x_pad = _pad_to_multiple(np.asarray(p.train_x, np.float32),
                                 self.batch_size)
        s_pad = np.ones(len(x_pad), np.float32)
        s_pad[:p.n] = p.scalings
        self._var_ctx = (jax.device_put(x_pad), jax.device_put(s_pad),
                         settings.snapshot())
        return True

    def _write_factor_cache(self, path) -> None:
        """Persist the live factor: the row-sharded [n_pad, n_pad] lower
        triangle fetched in bounded row blocks into a memmapped .npy
        (never a second whole-matrix host copy) + the replicated diag
        stack + the identity metadata."""
        import functools

        import jax
        from jax import lax

        f = self._factor
        os.makedirs(path, exist_ok=True)
        meta = self._cache_meta(f.block, f.mesh.devices.size)
        rows = min(4096, f.n_pad)

        @functools.partial(jax.jit, static_argnames=("rows",))
        def fetch(l, r0, rows):
            return lax.dynamic_slice(l, (r0, 0), (rows, l.shape[1]))

        l_mm = np.lib.format.open_memmap(
            os.path.join(path, "l.npy"), mode="w+", dtype=np.float32,
            shape=(f.n_pad, f.n_pad))
        from .parallel.chol_dist import _chunk_starts
        for r0 in _chunk_starts(f.n_pad, rows):   # slide-back: idempotent
            l_mm[r0:r0 + rows] = np.asarray(fetch(f.l_loc, np.int32(r0),
                                                  rows))
        l_mm.flush()
        del l_mm
        np.save(os.path.join(path, "diags.npy"), np.asarray(f.diags))
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(meta, fh)

    def variances(self, z) -> np.ndarray:
        """GP posterior variances ``k_zz - k_zx (K + jr I)^-1 k_xz``
        through the rebuilt factor, matrix-free per bounded query block
        (float64 oracle: ``ops.solve.predictive_variance``; float32
        accumulation floor ~eps32 * k_zz).  Empty-split safe."""
        from .parallel.device_large import variances_from_factor

        if self._factor is None:
            raise RuntimeError("call prepare_variances() once before "
                               "variances()")
        x_all, s_dev, snap = self._var_ctx
        return variances_from_factor(
            self._factor, self.model, x_all, s_dev,
            np.asarray(z, np.float32), self.batch_size, self.posterior.n,
            snap)
