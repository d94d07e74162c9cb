"""GP solver tests: parity with the reference scipy path, refinement
quality, end-to-end classification on a synthetic problem."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import gram_in_memory


def _spd(n, seed=0):
    r = np.random.RandomState(seed)
    a = r.randn(n, n)
    return (a @ a.T + n * np.eye(n)).astype(np.float64)


def test_one_hot_targets():
    y = solve.one_hot_targets(np.array([0, 2, 1]), 3)
    want = np.array([[1, -1, -1], [-1, -1, 1], [-1, 1, -1]], np.float64)
    np.testing.assert_array_equal(y, want)


def test_diag_add():
    k = np.zeros((4, 4))
    solve.diag_add(k, 2.5)
    np.testing.assert_array_equal(k, 2.5 * np.eye(4))


def test_symmetrize_from_upper_nan_lower():
    k = np.triu(_spd(6))
    k[np.tril_indices(6, -1)] = np.nan
    s = solve.symmetrize_from_upper(k.copy())
    np.testing.assert_array_equal(s, s.T)
    assert not np.isnan(s).any()


def test_scipy_solve_matches_reference_semantics():
    """assume_a='pos', lower=False: only the upper triangle is read
    (classify_gp.py:24-27) -- after symmetrization all methods agree."""
    k = _spd(50)
    y = solve.one_hot_targets(np.arange(50) % 10)
    a1 = solve.solve_gp(k.copy(), y, method="scipy")
    a2 = np.linalg.solve(k, y)
    np.testing.assert_allclose(a1, a2, rtol=1e-9)


def test_chol_matches_scipy():
    k = _spd(40, seed=1)
    y = solve.one_hot_targets(np.arange(40) % 10)
    a1 = solve.solve_gp(k.copy(), y, method="scipy")
    a2 = solve.solve_gp(k.copy(), y, method="chol")
    # float32 device cholesky: looser tolerance
    np.testing.assert_allclose(a1, a2, rtol=2e-3, atol=2e-3)


def test_chol_ir_recovers_float64_quality():
    k = _spd(60, seed=2)
    y = solve.one_hot_targets(np.arange(60) % 10)
    a64 = solve.solve_gp(k.copy(), y, method="scipy")
    a_ir = solve.solve_gp(k.copy(), y, method="chol_ir")
    np.testing.assert_allclose(a_ir, a64, rtol=1e-7, atol=1e-8)


def test_jitter_applied():
    k = np.eye(5)
    y = np.ones((5, 1))
    a = solve.solve_gp(k.copy(), y, jitter=1.0, method="scipy")
    np.testing.assert_allclose(a, 0.5 * np.ones((5, 1)))


@pytest.mark.parametrize("method", ["scipy", "chol_ir"])
def test_end_to_end_synthetic_classification(method):
    """Full pipeline on the synthetic prototype task: Gram -> solve ->
    accuracy must be near-perfect (integration analogue of the reference's
    MNIST reproduction, README.md:91-95)."""
    model = G.Sequential(
        G.Conv2d(7, var_weight=2.79 * 49, var_bias=7.86), G.ReLU(),
        G.Conv2d(14, padding=0, var_weight=2.79, var_bias=7.86))
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=120, n_test=40, shape=(1, 14, 14), seed=3)
    kxx = gram_in_memory(model, tr_x, batch_size=40, progress=False)
    kzx = gram_in_memory(model, te_x, tr_x, batch_size=40, progress=False)
    res = solve.classify(kxx, tr_y, jitter=1e-6, method=method,
                         test=(kzx, te_y))
    assert res["test"] > 0.9, res


def test_chol_methods_refuse_non_pd():
    """float32 lax Cholesky returns NaN silently on a non-PD matrix;
    chol/chol_ir must raise (argmaxing NaN scores would report ~chance
    accuracy that looks like a modeling result) like scipy does."""
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(16, 16))
    k = (q * np.r_[np.full(15, 1.0), -1e-4]) @ q.T   # one negative eigval
    y = solve.one_hot_targets(rng.randint(0, 3, 16))
    for method in ("chol", "chol_ir"):
        with pytest.raises(np.linalg.LinAlgError, match="jitter"):
            solve.solve_gp(k.copy(), y, method=method)


def test_evidence_jitter_is_relative():
    """log_marginal_likelihood's jitter_rel scales by mean(diag): explicit
    check against the absolute-jitter construction."""
    rng = np.random.RandomState(1)
    a = rng.randn(12, 12)
    k = a @ a.T + 12 * np.eye(12)
    y = solve.one_hot_targets(rng.randint(0, 2, 12))
    jr = 1e-3
    want = solve.log_marginal_likelihood(
        k + jr * np.mean(np.diagonal(k)) * np.eye(12), y)
    got = solve.log_marginal_likelihood(k, y, jitter_rel=jr)
    np.testing.assert_allclose(got, want, rtol=1e-12)
