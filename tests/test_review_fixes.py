"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import GramStore, TensorStoreGramStore, synthetic_arrays
from cnn_gp_tpu.parallel import compute_gram, compute_gram_sharded


@pytest.fixture(scope="module")
def model():
    return G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))


@pytest.fixture(scope="module")
def x():
    return synthetic_arrays(n_train=27, n_test=0, shape=(1, 7, 7))[0]


def test_resume_backfills_out(model, x, tmp_path):
    """compute_gram with store + out on a fully-resumed run must return
    the stored values, not NaN."""
    path = str(tmp_path / "g.h5")
    with GramStore(path, "w") as store:
        first = compute_gram(model, x, batch_size=10, store=store,
                             name="Kxx",
                             out=np.full((27, 27), np.nan, np.float32),
                             progress=False)
    with GramStore(path, "a") as store:
        again = compute_gram(model, x, batch_size=10, store=store,
                             name="Kxx",
                             out=np.full((27, 27), np.nan, np.float32),
                             progress=False)
    assert not np.isnan(again).any()
    np.testing.assert_array_equal(first, again)


def test_sharded_resume_backfills_out(model, x, tmp_path):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    path = str(tmp_path / "g.h5")
    with GramStore(path, "w") as store:
        compute_gram_sharded(model, x, batch_size=10, store=store,
                             name="Kxx", progress=False)
    with GramStore(path, "a") as store:
        again = compute_gram_sharded(
            model, x, batch_size=10, store=store, name="Kxx",
            out=np.full((27, 27), np.nan, np.float32), progress=False)
    assert not np.isnan(again).any()


def test_h5_batch_size_mismatch_raises(tmp_path):
    path = str(tmp_path / "g.h5")
    with GramStore(path, "w") as store:
        store.create("Kxx", 40, None, 10)
    with GramStore(path, "a") as store:
        with pytest.raises(ValueError, match="batch_size"):
            store.create("Kxx", 40, None, 20)
        # same params fine
        store.create("Kxx", 40, None, 10)
        with pytest.raises(ValueError, match="shape"):
            store.create("Kxx", 50, None, 10)


def test_h5_clamped_batch_size_consistent(tmp_path):
    """batch_size larger than N clamps; reopening with the same args must
    not false-positive."""
    path = str(tmp_path / "g.h5")
    with GramStore(path, "w") as store:
        store.create("Kv_diag", 5, None, 10, diag=True)
    with GramStore(path, "a") as store:
        store.create("Kv_diag", 5, None, 10, diag=True)  # no raise


def test_zarr_batch_size_mismatch_raises(tmp_path):
    pytest.importorskip("tensorstore")
    path = str(tmp_path / "g")
    with TensorStoreGramStore(path) as store:
        store.create("Kxx", 40, None, 10)
    with TensorStoreGramStore(path) as store:
        with pytest.raises(ValueError, match="batch_size"):
            store.create("Kxx", 40, None, 20)


def test_zarr_readonly_mode(tmp_path):
    pytest.importorskip("tensorstore")
    path = str(tmp_path / "g")
    with TensorStoreGramStore(path, "a") as store:
        store.create("Kxx", 20, None, 10)
        store.write_tile("Kxx", 0, 0, np.ones((10, 10), np.float32))
    with TensorStoreGramStore(path, "r") as store:
        assert store.read("Kxx").shape == (20, 20)
        with pytest.raises(PermissionError):
            store.write_tile("Kxx", 0, 10, np.ones((10, 10), np.float32))
        with pytest.raises(PermissionError):
            store.create("Kxvx", 20, 20, 10)


def test_fit_loss_sensitive_to_scale():
    """The NMLL must not be invariant to kernel rescaling (the detached
    normalisation keeps the scale-direction gradient)."""
    import jax
    from cnn_gp_tpu.fit import neg_marginal_log_likelihood
    x = synthetic_arrays(n_train=16, n_test=0, shape=(1, 8, 8))[0]
    y = np.random.RandomState(0).randn(16, 2).astype(np.float32)

    model = G.Mixture([G.Conv2d(8, padding=0, var_weight=1.0),
                       G.Conv2d(8, padding=0, var_weight=1.0)])
    # both branches identical => softmax direction is flat, but the grad
    # wrt a shared scale (sum direction) must be nonzero
    g = jax.grad(lambda m: neg_marginal_log_likelihood(m, x, y))(model)
    assert np.isfinite(np.asarray(g.logit)).all()

    scaled = G.Sequential(G.Conv2d(8, padding=0, var_weight=4.0))
    base = G.Sequential(G.Conv2d(8, padding=0, var_weight=1.0))
    l1 = float(neg_marginal_log_likelihood(base, x, y))
    l2 = float(neg_marginal_log_likelihood(scaled, x, y))
    assert abs(l1 - l2) > 1e-3, (l1, l2)
