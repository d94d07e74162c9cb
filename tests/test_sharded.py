"""Multi-device sharding tests on the 8-device virtual CPU mesh:
shard_map Gram sweep and distributed CG solve."""

import jax
import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import GramStore, synthetic_arrays
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import (cg_solve_sharded, compute_gram_sharded,
                                 gram_in_memory, make_mesh)


@pytest.fixture(scope="module")
def model():
    return G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend "
                    "(XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return make_mesh()


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_gram_matches_single(model, mesh):
    x, _, _, _ = synthetic_arrays(n_train=53, n_test=0, shape=(1, 7, 7))
    want = gram_in_memory(model, x, batch_size=10, progress=False)
    got = compute_gram_sharded(model, x, batch_size=10, mesh=mesh,
                               tiles_per_round_per_device=2, progress=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(got, got.T)


def test_sharded_gram_cross(model, mesh):
    x, _, _, _ = synthetic_arrays(n_train=23, n_test=0, shape=(1, 7, 7))
    z, _, _, _ = synthetic_arrays(n_train=31, n_test=0, shape=(1, 7, 7),
                                  seed=9)
    want = gram_in_memory(model, x, z, batch_size=10, progress=False)
    got = compute_gram_sharded(model, x, z, batch_size=10, mesh=mesh,
                               progress=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_sharded_gram_to_store_resume(model, mesh, tmp_path):
    x, _, _, _ = synthetic_arrays(n_train=33, n_test=0, shape=(1, 7, 7))
    path = str(tmp_path / "sharded.h5")
    with GramStore(path, "w") as store:
        compute_gram_sharded(model, x, batch_size=10, mesh=mesh,
                             store=store, name="Kxx", progress=False)
        store.assert_complete("Kxx", upper_triangle_only=True)
        # resume: everything done, second sweep is a no-op
        compute_gram_sharded(model, x, batch_size=10, mesh=mesh,
                             store=store, name="Kxx", progress=False)
        store.assert_complete("Kxx", upper_triangle_only=True)


def test_sharded_gram_single_upload(model, mesh, monkeypatch):
    """The dataset must be uploaded (device_put, replicated) exactly ONCE
    across all rounds — the per-round jnp.asarray(x_np) re-upload was
    transfer-bound on the real tunnel (round-2 VERDICT Weak #1)."""
    import jax.numpy as jnp
    from cnn_gp_tpu.parallel import gram_sharded as gs

    x, _, _, _ = synthetic_arrays(n_train=53, n_test=0, shape=(1, 7, 7))
    puts, asarrays = [], []
    real_put = jax.device_put
    real_asarray = jnp.asarray

    def spy_put(a, *args, **kw):
        if getattr(a, "ndim", 0) == 4:     # dataset-sized uploads only
            puts.append(a.shape)
        return real_put(a, *args, **kw)

    def spy_asarray(a, *args, **kw):
        if getattr(a, "ndim", 0) == 4 and isinstance(a, np.ndarray):
            asarrays.append(a.shape)       # an implicit re-upload path
        return real_asarray(a, *args, **kw)

    monkeypatch.setattr(gs.jax, "device_put", spy_put)
    monkeypatch.setattr(gs.jnp, "asarray", spy_asarray)
    got = compute_gram_sharded(model, x, batch_size=10, mesh=mesh,
                               tiles_per_round_per_device=1,  # many rounds
                               progress=False)
    assert len(puts) == 1, puts            # symmetric: one shared upload
    assert not asarrays, asarrays
    want = gram_in_memory(model, x, batch_size=10, progress=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_sharded_gram_resumed_noop_uploads_nothing(model, mesh, tmp_path,
                                                   monkeypatch):
    """Re-running on a fully completed store must not upload the dataset
    at all (the hoisted device_put sat before the zero-tile early exit;
    ~5-10 s of wasted replicated transfer per no-op on the real tunnel)."""
    from cnn_gp_tpu.parallel import gram_sharded as gs

    x, _, _, _ = synthetic_arrays(n_train=33, n_test=0, shape=(1, 7, 7))
    path = str(tmp_path / "sharded.h5")
    with GramStore(path, "w") as store:
        compute_gram_sharded(model, x, batch_size=10, mesh=mesh,
                             store=store, name="Kxx", progress=False)
        puts = []
        real_put = jax.device_put

        def spy_put(a, *args, **kw):
            if getattr(a, "ndim", 0) == 4:
                puts.append(a.shape)
            return real_put(a, *args, **kw)

        monkeypatch.setattr(gs.jax, "device_put", spy_put)
        compute_gram_sharded(model, x, batch_size=10, mesh=mesh,
                             store=store, name="Kxx", progress=False)
        assert not puts, puts
        store.assert_complete("Kxx", upper_triangle_only=True)


def _spd(n, seed=0):
    r = np.random.RandomState(seed)
    a = r.randn(n, n).astype(np.float64)
    return a @ a.T + n * np.eye(n)


def test_cg_matches_direct(mesh):
    k = _spd(100)
    y = solve.one_hot_targets(np.arange(100) % 10)
    want = np.linalg.solve(k + 0.1 * np.eye(100), y)
    got, rel, iters = cg_solve_sharded(k, y, jitter=0.1, mesh=mesh,
                                       tol=1e-6, maxiter=1000)
    assert rel < 1e-5
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_cg_uneven_rows(mesh):
    """N not divisible by device count: identity padding must not change
    the solution."""
    k = _spd(37, seed=1)
    y = solve.one_hot_targets(np.arange(37) % 10)
    want = np.linalg.solve(k, y)
    got, rel, _ = cg_solve_sharded(k, y, mesh=mesh, tol=1e-7, maxiter=500)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sharded_classification_end_to_end(mesh):
    """Sharded Gram + sharded CG + accuracy: the whole multi-chip pipeline
    on the virtual mesh."""
    model = G.Sequential(
        G.Conv2d(7, var_weight=2.79 * 49, var_bias=7.86), G.ReLU(),
        G.Conv2d(14, padding=0, var_weight=2.79, var_bias=7.86))
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=96, n_test=32, shape=(1, 14, 14), seed=4)
    kxx = compute_gram_sharded(model, tr_x, batch_size=32, mesh=mesh,
                               progress=False)
    kzx = compute_gram_sharded(model, te_x, tr_x, batch_size=32, mesh=mesh,
                               progress=False)
    # normalise scale for CG conditioning (pure row/col scaling)
    s = np.sqrt(np.diagonal(kxx).mean())
    a, rel, _ = cg_solve_sharded(kxx / s ** 2,
                                 solve.one_hot_targets(tr_y),
                                 jitter=1e-8, mesh=mesh, tol=1e-6,
                                 maxiter=2000)
    acc = solve.accuracy(solve.predict(kzx / s ** 2, a), te_y)
    assert acc > 0.9, acc
