"""In-place factor extension (`_ShardedFactor.extend`): online data
addition without refactorisation.

No reference counterpart: adding training data to the reference means
recomputing the Gram HDF5 and re-running the whole LAPACK solve
(reference: exp_mnist_resnet/classify_gp.py:17-27); here the live blocked
factor grows in place at O(N^2 m).

All tests run on the 8-device virtual CPU mesh (conftest).  Systems are
Jacobi-equilibrated (unit diagonal) like every production caller, so
float32 factor entries are O(1) and absolute tolerances are meaningful.
"""

import numpy as np
import pytest

from cnn_gp_tpu.parallel.chol_dist import _ShardedFactor
from cnn_gp_tpu.parallel import make_mesh


def _spd_equilibrated(n, seed=0):
    """Random SPD matrix scaled to exactly unit diagonal (float64)."""
    rng = np.random.RandomState(seed)
    a = rng.randn(n, n)
    k = a @ a.T + n * np.eye(n)
    s = 1.0 / np.sqrt(np.diagonal(k))
    return k * s[:, None] * s[None, :]


def _gather_factor(f):
    """Host copy of the live factor's leading [n, n] lower triangle."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    lfull = np.asarray(jax.device_put(
        f.l_loc, NamedSharding(f.mesh, P())))
    return np.tril(lfull[: f.n, : f.n])


@pytest.mark.parametrize("n,m,block", [
    (40, 12, 16),    # unaligned n and n+m, extension inside one block rgn
    (37, 19, 16),    # crosses a block boundary mid-extension
])
def test_extend_matches_full_factor(n, m, block):
    mesh = make_mesh()
    m2 = _spd_equilibrated(n + m, seed=n)
    f = _ShardedFactor(mesh, n, block, capacity=n + m)
    f.factorize(m2[:n, :n].astype(np.float32))
    f.extend(m2[n:, :n], m2[n:, n:])
    assert f.n == n + m

    want = np.linalg.cholesky(m2)
    got = _gather_factor(f)
    np.testing.assert_allclose(got, want, atol=5e-5)

    # the refreshed diag stack must match the factor's diagonal blocks
    # (the solve programs read diags, not the buffer's diagonal)
    diags = np.asarray(f.diags)
    for kb in range((n + m - 1) // block + 1):
        c0 = kb * block
        hi = min(c0 + block, n + m)
        np.testing.assert_allclose(
            np.tril(diags[kb])[: hi - c0, : hi - c0],
            want[c0:hi, c0:hi] * np.tri(hi - c0), atol=5e-5)


def test_extend_solve_with_refinement():
    """The extended factor drives float32+IR solves to float64 quality,
    exactly like a from-scratch factor (the production usage pattern)."""
    n, m, block = 96, 32, 32
    mesh = make_mesh()
    m2 = _spd_equilibrated(n + m, seed=3)
    y = np.random.RandomState(7).randn(n + m, 4)

    f = _ShardedFactor(mesh, n, block, capacity=n + m)
    f.factorize(m2[:n, :n].astype(np.float32))
    f.extend(m2[n:, :n], m2[n:, n:])

    a = f.solve(y.astype(np.float32)).astype(np.float64)
    for _ in range(3):
        r = y - m2 @ a
        a = a + f.solve(r.astype(np.float32)).astype(np.float64)
    rel = np.linalg.norm(y - m2 @ a) / np.linalg.norm(y)
    assert rel < 1e-10, rel
    np.testing.assert_allclose(a, np.linalg.solve(m2, y), rtol=1e-8)


def test_extend_twice_and_logdet():
    """Chained extensions stay exact; log_diag_sum tracks the live
    factor (the evidence path's log-determinant input)."""
    n, m1, m2_, block = 30, 11, 23, 16
    mesh = make_mesh()
    full = _spd_equilibrated(n + m1 + m2_, seed=11)

    f = _ShardedFactor(mesh, n, block, capacity=n + m1 + m2_)
    f.factorize(full[:n, :n].astype(np.float32))
    f.extend(full[n:n + m1, :n], full[n:n + m1, n:n + m1])
    k = n + m1
    f.extend(full[k:, :k], full[k:, k:])

    want = np.linalg.cholesky(full)
    np.testing.assert_allclose(_gather_factor(f), want, atol=5e-5)

    want_logdet_half = float(np.sum(np.log(np.diagonal(want))))
    assert abs(f.log_diag_sum() - want_logdet_half) < 1e-4


def test_extend_non_pd_refused_factor_intact():
    """A non-PD extension (duplicate rows make the Schur complement
    singular) must raise BEFORE the donated in-place write — the live
    factor keeps serving solves from the pre-extend state."""
    n, block = 32, 16
    mesh = make_mesh()
    k = _spd_equilibrated(n, seed=2)
    f = _ShardedFactor(mesh, n, block, capacity=n + 8)
    f.factorize(k.astype(np.float32))
    before = _gather_factor(f)

    # new rows exactly duplicating training rows 0..7: the extended
    # system is singular, float32 cholesky of the Schur complement NaNs
    b_dup = k[:8, :].astype(np.float32)
    c_dup = k[:8, :8].astype(np.float32)
    with pytest.raises(ValueError, match="positive-definite"):
        f.extend(b_dup, c_dup)

    assert f.n == n                          # size unchanged
    np.testing.assert_array_equal(_gather_factor(f), before)
    # and the factor still solves
    y = np.random.RandomState(0).randn(n, 3)
    a = f.solve(y.astype(np.float32)).astype(np.float64)
    rel = np.linalg.norm(y - k @ a) / np.linalg.norm(y)
    assert rel < 1e-3, rel


def test_extend_program_cache_reused():
    """Streaming adds of the same width reuse ONE compiled extend program
    (n0 is a traced scalar): the per-width cache entry is created on the
    first extend and hit, not rebuilt, on the second."""
    n, m, block = 16, 8, 8
    mesh = make_mesh()
    full = _spd_equilibrated(n + 2 * m, seed=21)
    f = _ShardedFactor(mesh, n, block, capacity=n + 2 * m)
    f.factorize(full[:n, :n].astype(np.float32))
    f.extend(full[n:n + m, :n], full[n:n + m, n:n + m])
    progs = f._solvers[("extend", m)]
    k = n + m
    f.extend(full[k:, :k], full[k:, k:])
    assert f._solvers[("extend", m)] is progs
    np.testing.assert_allclose(_gather_factor(f),
                               np.linalg.cholesky(full), atol=5e-5)


def test_extend_capacity_refused():
    mesh = make_mesh()
    k = _spd_equilibrated(24, seed=5)
    f = _ShardedFactor(mesh, 24, 8)          # no reserved capacity beyond
    f.factorize(k.astype(np.float32))        # the n_pad alignment slack
    spare = f.n_pad - f.n
    with pytest.raises(ValueError, match="capacity"):
        f.extend(np.zeros((spare + 1, 24), np.float32),
                 np.eye(spare + 1, dtype=np.float32))


def test_extend_device_matches_extend():
    """`extend_device` (cross blocks already on device — the upload-free
    path the regen-mode IncrementalGP assembles by tile regeneration)
    runs the identical `_extend_core` programs as `extend`, so identical
    inputs give a bit-identical factor and solves."""
    import jax.numpy as jnp

    n, m, block = 37, 19, 16
    mesh = make_mesh()
    m2 = _spd_equilibrated(n + m, seed=5)
    rhs = np.random.RandomState(2).randn(n + m, 4).astype(np.float32)

    f_host = _ShardedFactor(mesh, n, block, capacity=n + m)
    f_host.factorize(m2[:n, :n].astype(np.float32))
    f_host.extend(m2[n:, :n], m2[n:, n:])

    f_dev = _ShardedFactor(mesh, n, block, capacity=n + m)
    f_dev.factorize(m2[:n, :n].astype(np.float32))
    w = np.zeros((f_dev.n_pad, m), np.float32)
    w[:n] = m2[:n, n:]                       # scaled B^T, zero pad rows
    f_dev.extend_device(jnp.asarray(w),
                        jnp.asarray(m2[n:, n:].astype(np.float32)))
    assert f_dev.n == n + m

    np.testing.assert_array_equal(f_dev.solve(rhs), f_host.solve(rhs))
    np.testing.assert_array_equal(_gather_factor(f_dev),
                                  _gather_factor(f_host))


def test_extend_device_validation():
    import jax.numpy as jnp

    mesh = make_mesh()
    f = _ShardedFactor(mesh, 16, 8, capacity=24)
    with pytest.raises(RuntimeError, match="factorize"):
        f.extend_device(jnp.zeros((f.n_pad, 8)), jnp.zeros((8, 8)))
    f.factorize(_spd_equilibrated(16).astype(np.float32))
    with pytest.raises(ValueError):
        f.extend_device(jnp.zeros((3, 8)), jnp.zeros((8, 8)))   # bad shape
    with pytest.raises(ValueError, match="capacity"):
        f.extend_device(jnp.zeros((f.n_pad, f.n_pad)),          # too wide
                        jnp.zeros((f.n_pad, f.n_pad)))
