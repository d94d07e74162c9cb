"""Mesh-distributed blocked Cholesky tests (8-device virtual CPU mesh).

Validates the TPU-native direct solve against float64 LAPACK — including on
a real paper-config NNGP Gram whose diagonal reaches ~1e12, the regime the
reference's float64 assertion exists for (reference:
exp_mnist_resnet/classify_gp.py:19-23).
"""

import jax
import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import (chol_solve_dist, cholesky_sharded,
                                 cholesky_solve_sharded, gram_in_memory,
                                 make_mesh)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    return make_mesh()


def _spd(n, seed=0, scale=None):
    r = np.random.RandomState(seed)
    a = r.randn(n, n)
    k = a @ a.T / n + np.eye(n)
    if scale is not None:
        d = np.sqrt(10 ** r.uniform(scale - 2, scale, n))
        k = d[:, None] * k * d[None, :]
    return k


@pytest.mark.parametrize("n,block", [(64, 16), (100, 16), (37, 8), (130, 32)])
def test_factor_matches_lapack(mesh, n, block):
    """Blocked mesh factor == np.linalg.cholesky, incl. N not divisible by
    block or device count (identity-padding path)."""
    k = _spd(n, seed=n)
    got = cholesky_sharded(k, mesh, block=block)
    want = np.linalg.cholesky(k)
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_factor_reads_only_lower_triangle(mesh):
    """The factor's input contract is lower-triangle-only: the large-N
    assembly (device_large.py) never writes the upper half, and when the
    Gram tile grid is FINER than the factor block the unwritten region
    even cuts through diagonal blocks.  Garbage (here: zeros and NaNs)
    strictly above the diagonal must not change the factor — this guards
    the jnp.linalg.cholesky (A+A^T)/2 symmetrization trap that NaN'd the
    b < block case."""
    k = _spd(64, seed=7)
    want = np.linalg.cholesky(k)
    y = np.random.RandomState(8).randn(64, 3)
    want_a = np.linalg.solve(k, y)
    for garbage in (np.zeros_like(k), np.full_like(k, np.nan)):
        klow = np.tril(k) + np.triu(garbage, 1)
        got = cholesky_sharded(klow, mesh, block=16)
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * np.abs(want).max())
        a = cholesky_solve_sharded(klow, y, mesh, block=16)
        np.testing.assert_allclose(a, want_a, rtol=1e-3, atol=1e-4)


def test_f32_solve_matches(mesh):
    k = _spd(90, seed=3)
    y = np.random.RandomState(4).randn(90, 10)
    got = cholesky_solve_sharded(k, y, mesh, block=16)
    want = np.linalg.solve(k, y)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_refined_solve_float64_parity(mesh):
    """With refinement the distributed solve must match float64 LAPACK to
    ~1e-8 relative — the round-2 'done' bar (VERDICT.md #1)."""
    k = _spd(120, seed=5)
    y = solve.one_hot_targets(np.arange(120) % 10)
    want = np.linalg.solve(k, y)
    got, rel, iters = chol_solve_dist(k.copy(), y, mesh=mesh, block=16)
    assert rel < 1e-10, rel
    np.testing.assert_allclose(got, want, rtol=1e-8,
                               atol=1e-10 * np.abs(want).max())


def test_nngp_scale_diagonal(mesh):
    """Diagonal ~1e12 (paper-config Gram scale): equilibration + refinement
    must still reach float64-quality solutions."""
    k = _spd(96, seed=7, scale=12)
    y = solve.one_hot_targets(np.arange(96) % 10)
    want = np.linalg.solve(k + 1e4 * np.eye(96), y)
    got, rel, _ = chol_solve_dist(k.copy(), y, jitter=1e4, mesh=mesh,
                                  block=16)
    assert rel < 1e-10, rel
    np.testing.assert_allclose(got, want, rtol=1e-7,
                               atol=1e-9 * np.abs(want).max())


def test_real_paper_gram(mesh):
    """End-to-end on a real `mnist_paper_convnet_gp`-style Gram (values
    ~1e12): chol_dist == scipy float64 solutions and predictions."""
    import configs
    model = configs.load("mnist_paper_convnet_gp").initial_model
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=64, n_test=24, shape=(1, 28, 28), seed=11)
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=32,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(model, te_x, tr_x, batch_size=32,
                                    progress=False), np.float64)
    assert kxx.flat[0] > 1e11          # genuinely at the paper's scale
    y = solve.one_hot_targets(tr_y)

    a_ref = solve.solve_gp(kxx.copy(), y, method="scipy")
    a_got, rel, iters = chol_solve_dist(kxx.copy(), y, mesh=mesh, block=16)
    assert rel < 1e-10, rel
    scale = np.abs(a_ref).max()
    np.testing.assert_allclose(a_got, a_ref, rtol=1e-6, atol=1e-8 * scale)
    np.testing.assert_array_equal(solve.predict(kzx, a_got),
                                  solve.predict(kzx, a_ref))


def test_solve_gp_method_chol_dist(mesh):
    """--solver=chol_dist path through ops.solve.solve_gp."""
    k = _spd(64, seed=13)
    y = solve.one_hot_targets(np.arange(64) % 10)
    want = np.linalg.solve(k + 0.1 * np.eye(64), y)
    got = solve.solve_gp(k.copy(), y, jitter=0.1, method="chol_dist")
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_single_device_mesh():
    """The blocked program must also run on a 1-device mesh (the real
    single-chip deployment)."""
    mesh1 = make_mesh(n_devices=1)
    k = _spd(50, seed=17)
    y = np.random.RandomState(18).randn(50, 3)
    got, rel, _ = chol_solve_dist(k.copy(), y, mesh=mesh1, block=16)
    np.testing.assert_allclose(got, np.linalg.solve(k, y),
                               rtol=1e-8, atol=1e-10)


def test_ir32_float32_data_solve(mesh):
    """chol_solve_ir32 must solve the float64 embedding of float32 data to
    refinement tolerance without ever holding a float64 matrix."""
    k32 = _spd(100, seed=21, scale=12).astype(np.float32)
    y = solve.one_hot_targets(np.arange(100) % 10)
    from cnn_gp_tpu.parallel import chol_solve_ir32
    got, rel, iters = chol_solve_ir32(k32, y, jitter=1e3, mesh=mesh,
                                      block=16, io_rows=32)
    want = np.linalg.solve(k32.astype(np.float64) + 1e3 * np.eye(100), y)
    assert rel < 1e-10, rel
    np.testing.assert_allclose(got, want, rtol=1e-7,
                               atol=1e-9 * np.abs(want).max())


@pytest.mark.slow
def test_medium_n_battery(mesh):
    """Round-2 VERDICT #3: medium-N multi-chip case on the 8-device mesh —
    N=2333 (divisible by neither block nor device count), block=128
    (multi-block-per-device: 19 blocks over 8 devices), nrhs=10, paper
    ~1e12 diagonal scale.  Residual at the refinement tolerance and the
    solution at float64-LAPACK parity."""
    n, block = 2333, 128
    k = _spd(n, seed=23, scale=12)
    jitter = 1e4
    y = solve.one_hot_targets(np.arange(n) % 10)
    assert y.shape[1] == 10
    got, rel, iters = chol_solve_dist(k.copy(), y, jitter=jitter,
                                      mesh=mesh, block=block)
    assert rel < 1e-10, rel
    want = np.linalg.solve(k + jitter * np.eye(n), y)
    np.testing.assert_allclose(got, want, rtol=1e-6,
                               atol=1e-8 * np.abs(want).max())


def test_solve_from_store(mesh, tmp_path):
    """Blocked-I/O classify path: upper-triangle store -> chol solve,
    matching scipy on the symmetrised float64 load."""
    from cnn_gp_tpu.data import GramStore
    from cnn_gp_tpu.parallel import chol_solve_dist_from_store

    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    x, yl, _, _ = synthetic_arrays(n_train=70, n_test=0, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(model, x, batch_size=16, progress=False))
    path = str(tmp_path / "k.h5")
    with GramStore(path, "w") as store:
        store.create("Kxx", 70, 70, 16)
        for i in range(0, 70, 16):
            for j in range(i, 70, 16):
                store.write_tile("Kxx", i, j, k[i:i+16, j:j+16])
        y = solve.one_hot_targets(yl)
        got, rel, _ = chol_solve_dist_from_store(store, "Kxx", y,
                                                 jitter=1e-6, mesh=mesh,
                                                 block=16)
        kxx64 = solve.symmetrize_from_upper(store.read("Kxx",
                                                       dtype=np.float64))
        want = solve.solve_gp(kxx64, y, jitter=1e-6, method="scipy")
    assert rel < 1e-10, rel
    np.testing.assert_allclose(got, want, rtol=1e-6,
                               atol=1e-8 * np.abs(want).max())


def test_solve_stream_from_store(mesh, tmp_path):
    """The streamed classify path (read+mirror producer thread overlapped
    with the upload, device-side scaling + NaN refusal) returns the same
    solution as the serial from_store path and the scipy oracle —
    including with return_factor, whose live factor must serve variances
    exactly like the serial one.  Odd sizes: n=70 with io_rows=32 and
    block=16 exercise the partial tail chunk on both threads."""
    from cnn_gp_tpu.data import GramStore
    from cnn_gp_tpu.parallel import (chol_solve_dist_from_store,
                                     chol_solve_stream_from_store)
    from cnn_gp_tpu.parallel.chol_dist import variances_from_cross_host

    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    x, yl, zx, _ = synthetic_arrays(n_train=70, n_test=12, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(model, x, batch_size=16, progress=False))
    kzx = np.asarray(gram_in_memory(model, zx, x, batch_size=16,
                                    progress=False))
    kzz_d = np.asarray(model(zx, diag=True), np.float64)
    path = str(tmp_path / "k.h5")
    with GramStore(path, "w") as store:
        store.create("Kxx", 70, 70, 16)
        for i in range(0, 70, 16):
            for j in range(i, 70, 16):
                store.write_tile("Kxx", i, j, k[i:i+16, j:j+16])
        y = solve.one_hot_targets(yl)
        a_s, rel_s, _, factor_s, s_s = chol_solve_stream_from_store(
            store, "Kxx", y, jitter=1e-6, mesh=mesh, block=16,
            io_rows=32, return_factor=True)
        a_d, rel_d, _, factor_d, s_d = chol_solve_dist_from_store(
            store, "Kxx", y, jitter=1e-6, mesh=mesh, block=16,
            return_factor=True)
        kxx64 = solve.symmetrize_from_upper(store.read("Kxx",
                                                       dtype=np.float64))
    want = solve.solve_gp(kxx64, y, jitter=1e-6, method="scipy")
    assert rel_s < 1e-10, rel_s
    np.testing.assert_allclose(a_s, want, rtol=1e-6,
                               atol=1e-8 * np.abs(want).max())
    np.testing.assert_allclose(a_s, a_d, rtol=1e-7,
                               atol=1e-9 * np.abs(a_d).max())
    np.testing.assert_array_equal(s_s, s_d)   # same f64 diagonal -> same s
    v_s = variances_from_cross_host(factor_s, s_s, kzx, kzz_d)
    v_d = variances_from_cross_host(factor_d, s_d, kzx, kzz_d)
    scale = float(kzz_d.mean())
    np.testing.assert_allclose(v_s, v_d, rtol=2e-4, atol=1e-5 * scale)


def test_solve_stream_refuses_holes(mesh, tmp_path):
    """A NaN-holed Gram is refused by the streamed path's device-side
    scan — the same refusal contract as the serial path's host isnan."""
    from cnn_gp_tpu.data import GramStore
    from cnn_gp_tpu.parallel import chol_solve_stream_from_store

    path = str(tmp_path / "holed.h5")
    n = 48
    rng = np.random.default_rng(0)
    k = rng.standard_normal((n, n)).astype(np.float32)
    k = k @ k.T + n * np.eye(n, dtype=np.float32)
    with GramStore(path, "w") as store:
        store.create("Kxx", n, n, 16)
        for i in range(0, n, 16):
            for j in range(i, n, 16):
                if (i, j) == (16, 32):
                    continue                       # the hole
                store.write_tile("Kxx", i, j, k[i:i+16, j:j+16])
        y = solve.one_hot_targets(np.arange(n) % 4)
        with pytest.raises(RuntimeError, match="NaN holes"):
            chol_solve_stream_from_store(store, "Kxx", y, jitter=1e-3,
                                         mesh=mesh, block=16, io_rows=32)
