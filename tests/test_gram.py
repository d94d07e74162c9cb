"""Gram assembly tests: blockwise == monolithic, worker sharding, store
round-trip, tile-level resume."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import GramStore, merge_stores, synthetic_arrays
from cnn_gp_tpu.parallel import (compute_gram, compute_gram_diag,
                                 gram_in_memory, save_K)


@pytest.fixture(scope="module")
def model():
    return G.Sequential(G.Conv2d(3), G.ReLU(),
                        G.Conv2d(3, stride=2), G.ReLU(),
                        G.Conv2d(7, padding=0))


@pytest.fixture(scope="module")
def data():
    x, _, _, _ = synthetic_arrays(n_train=37, n_test=0, shape=(1, 14, 14))
    z, _, _, _ = synthetic_arrays(n_train=23, n_test=0, shape=(1, 14, 14),
                                  seed=5)
    return x, z


def test_blockwise_matches_monolithic_symmetric(model, data):
    x, _ = data
    want = np.asarray(model(x))
    got = gram_in_memory(model, x, batch_size=10, progress=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
    # exact symmetry after mirroring
    np.testing.assert_array_equal(got, got.T)


def test_blockwise_matches_monolithic_cross(model, data):
    x, z = data
    want = np.asarray(model(x, z, same=False))
    got = gram_in_memory(model, x, z, batch_size=10, progress=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_diag_matches_monolithic(model, data):
    x, _ = data
    want = np.asarray(model(x, diag=True))
    got = compute_gram_diag(model, x, batch_size=10, progress=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_worker_sharding_union_covers(model, data, tmp_path):
    """N workers writing disjoint spans to separate stores + NaN merge must
    reproduce the single-worker result (the reference's whole distribution
    strategy, reference: run.bash:27-43 + merge_h5_files.py)."""
    x, _ = data
    n_workers = 3
    paths = [str(tmp_path / f"{r:02d}.h5") for r in range(n_workers)]
    for r in range(n_workers):
        with GramStore(paths[r], "w") as store:
            compute_gram(model, x, batch_size=10, store=store, name="Kxx",
                         worker_rank=r, n_workers=n_workers, progress=False)
    merge_stores(paths[0], paths[1:])
    with GramStore(paths[0], "r") as store:
        store.assert_complete("Kxx", upper_triangle_only=True)
        merged = store.read("Kxx")
    want = np.asarray(model(x))
    iu = np.triu_indices(len(x))
    np.testing.assert_allclose(merged[iu], want[iu], rtol=2e-5, atol=1e-7)
    # sub-diagonal *tiles* stay NaN fill (diagonal tiles write their full
    # square, same as the reference's whole-block writes)
    assert np.isnan(merged[20:30, 0:10]).all()
    assert np.isnan(merged[30:37, 10:20]).all()


def test_tile_resume_skips_done(model, data, tmp_path):
    x, _ = data
    path = str(tmp_path / "resume.h5")
    with GramStore(path, "w") as store:
        compute_gram(model, x, batch_size=10, store=store, name="Kxx",
                     progress=False)
        done_before = np.asarray(store.f["_done/Kxx"]).copy()
    # second run: all tiles done => no work, file unchanged
    with GramStore(path, "a") as store:
        compute_gram(model, x, batch_size=10, store=store, name="Kxx",
                     progress=False)
        np.testing.assert_array_equal(
            np.asarray(store.f["_done/Kxx"]), done_before)
        store.assert_complete("Kxx", upper_triangle_only=True)


def test_missing_tiles_detects_holes(model, data, tmp_path):
    x, _ = data
    path = str(tmp_path / "holes.h5")
    with GramStore(path, "w") as store:
        store.create("Kxx", len(x), None, 10)
        miss = store.missing_tiles("Kxx", upper_triangle_only=True)
        assert len(miss) == 10  # 4x4 upper triangle
        with pytest.raises(RuntimeError):
            store.assert_complete("Kxx", upper_triangle_only=True)


def test_save_K_dataset_objects(model, data, tmp_path):
    from cnn_gp_tpu.data import ArrayDataset
    x, z = data
    ds_x = ArrayDataset(x, np.zeros(len(x), np.int64))
    ds_z = ArrayDataset(z, np.zeros(len(z), np.int64))
    path = str(tmp_path / "savek.h5")
    with GramStore(path, "w") as store:
        save_K(store, model, "Kxvx", ds_x, ds_z, diag=False, batch_size=10)
        save_K(store, model, "Kv_diag", ds_x, None, diag=True, batch_size=10)
        assert store.read("Kxvx").shape == (len(x), len(z))
        assert store.read("Kv_diag").shape == (len(x),)
        assert not np.isnan(store.read("Kxvx")).any()


def test_threaded_queue_matches_sync(model, data):
    """The threaded _WriteQueue (consumer-thread drain that keeps the
    dispatch thread off the fetch path — the round-4 save-leg fix) must
    produce byte-identical tiles to the synchronous drain, and its phase
    accounting must cover the fetch/scan/write legs it claims to."""
    from cnn_gp_tpu.parallel import gram as gram_mod

    x, _ = data
    want = np.asarray(compute_gram_sync(model, x))
    got = gram_in_memory(model, x, batch_size=10, progress=False)
    np.testing.assert_array_equal(got, want)


def compute_gram_sync(model, x):
    """gram_in_memory with the queue forced synchronous."""
    from cnn_gp_tpu.parallel import gram as gram_mod
    import functools
    orig = gram_mod._WriteQueue
    gram_mod._WriteQueue = functools.partial(orig, threaded=False)
    try:
        return gram_in_memory(model, x, batch_size=10, progress=False)
    finally:
        gram_mod._WriteQueue = orig


def test_threaded_queue_phase_accounting(model, data, tmp_path):
    """phases covers every leg with non-negative walls after a store
    write pass (the save-profile instrumentation, VERDICT r4 item 3)."""
    from cnn_gp_tpu.parallel.gram import _WriteQueue, compute_gram

    x, _ = data
    path = str(tmp_path / "phase.h5")
    captured = []
    orig_flush = _WriteQueue.flush

    def spy_flush(self):
        orig_flush(self)
        captured.append(dict(self.phases))

    _WriteQueue.flush = spy_flush
    try:
        with GramStore(path, "w") as store:
            compute_gram(model, x, batch_size=10, store=store, name="Kxx",
                         progress=False)
    finally:
        _WriteQueue.flush = orig_flush
    assert captured, "flush never ran"
    ph = captured[-1]
    assert set(ph) == {"fetch", "scan", "write", "blocked"}
    assert all(v >= 0.0 for v in ph.values())
    assert ph["fetch"] > 0.0          # tiles were actually fetched
