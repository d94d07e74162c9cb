"""TensorStore/Zarr Gram store tests: interface parity with the HDF5
store, concurrent-writer semantics, backend selection."""

import numpy as np
import pytest

ts = pytest.importorskip("tensorstore")

import cnn_gp_tpu as G  # noqa: E402
from cnn_gp_tpu.data import (TensorStoreGramStore, open_store,  # noqa: E402
                             synthetic_arrays)
from cnn_gp_tpu.parallel import compute_gram  # noqa: E402


def test_create_write_read_roundtrip(tmp_path):
    with TensorStoreGramStore(str(tmp_path / "g")) as store:
        store.create("Kxx", 25, None, 10)
        blk = np.arange(100, dtype=np.float32).reshape(10, 10)
        store.write_tile("Kxx", 0, 10, blk)
        out = store.read("Kxx")
        np.testing.assert_array_equal(out[0:10, 10:20], blk)
        assert np.isnan(out[0:10, 0:10]).all()  # NaN fill
        assert store.tile_done("Kxx", 0, 10)
        assert not store.tile_done("Kxx", 0, 0)


def test_missing_tiles_and_assert(tmp_path):
    with TensorStoreGramStore(str(tmp_path / "g")) as store:
        store.create("Kxx", 20, None, 10)
        assert len(store.missing_tiles("Kxx", upper_triangle_only=True)) == 3
        with pytest.raises(RuntimeError):
            store.assert_complete("Kxx")


def test_diag_dataset(tmp_path):
    with TensorStoreGramStore(str(tmp_path / "g")) as store:
        store.create("Kv_diag", 25, None, 10, diag=True)
        store.write_tile("Kv_diag", 20, None, np.ones(5, np.float32))
        assert store.tile_done("Kv_diag", 20, None)
        out = store.read("Kv_diag")
        np.testing.assert_array_equal(out[20:], np.ones(5))


def test_gram_assembly_into_zarr(tmp_path):
    """Full assembly path writing directly to the zarr backend."""
    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    x, _, _, _ = synthetic_arrays(n_train=27, n_test=0, shape=(1, 7, 7))
    with TensorStoreGramStore(str(tmp_path / "g")) as store:
        compute_gram(model, x, batch_size=10, store=store, name="Kxx",
                     progress=False)
        store.assert_complete("Kxx", upper_triangle_only=True)
        out = store.read("Kxx")
    want = np.asarray(model(x))
    iu = np.triu_indices(27)
    np.testing.assert_allclose(out[iu], want[iu], rtol=2e-5, atol=1e-7)


def test_concurrent_workers_one_store(tmp_path):
    """Two workers write disjoint tile spans into the SAME zarr store --
    no merge step needed (unlike the reference's per-worker H5 files)."""
    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    x, _, _, _ = synthetic_arrays(n_train=33, n_test=0, shape=(1, 7, 7))
    path = str(tmp_path / "g")
    for rank in range(2):
        with TensorStoreGramStore(path) as store:
            compute_gram(model, x, batch_size=10, store=store, name="Kxx",
                         worker_rank=rank, n_workers=2, progress=False)
    with TensorStoreGramStore(path) as store:
        store.assert_complete("Kxx", upper_triangle_only=True)


def test_open_store_backend_selection(tmp_path):
    from cnn_gp_tpu.data.store import GramStore
    s1 = open_store(str(tmp_path / "a.h5"), "w")
    assert isinstance(s1, GramStore)
    s1.close()
    s2 = open_store(str(tmp_path / "b.zarr"))
    assert isinstance(s2, TensorStoreGramStore)
    s2.close()


def test_mode_w_truncates(tmp_path):
    """mode='w' must truncate like the h5 backend -- a stale _done bitmap
    would otherwise silently skip all work on a new run."""
    path = str(tmp_path / "g")
    with TensorStoreGramStore(path, "w") as store:
        store.create("Kxx", 20, None, 10)
        store.write_tile("Kxx", 0, 0, np.ones((10, 10), np.float32))
    with TensorStoreGramStore(path, "w") as store:
        store.create("Kxx", 20, None, 10)
        assert not store.tile_done("Kxx", 0, 0)
        assert np.isnan(store.read("Kxx")).all()


def test_url_kvstore_form():
    """URL paths (gs://, s3://, memory://) must pass through as tensorstore
    kvstore URLs, not local file paths."""
    with TensorStoreGramStore("memory://grams_test") as store:
        store.create("Kxx", 20, None, 10)
        store.write_tile("Kxx", 0, 10, np.ones((10, 10), np.float32))
        assert store.tile_done("Kxx", 0, 10)
        assert store.read("Kxx")[0, 10] == 1.0


def test_done_mask_bulk_read(tmp_path):
    with TensorStoreGramStore(str(tmp_path / "g")) as store:
        store.create("Kxx", 30, None, 10)
        store.write_tile("Kxx", 10, 20, np.ones((10, 10), np.float32))
        mask = store.done_mask("Kxx")
        assert mask.shape == (3, 3)
        assert mask[1, 2] == 1 and mask.sum() == 1


def test_mode_w_truncates_url_store(tmp_path):
    """'w' must truncate URL-form (object-store) stores too: a stale
    array + done bitmap would serve the PREVIOUS run's kernel values as
    the new run's result with every tile marked complete.  (file:// is
    the only URL form with shared backing in this egress-free
    environment; memory:// contexts are isolated per open.)"""
    url = f"file://{tmp_path}/g"
    with TensorStoreGramStore(url, "w") as store:
        store.create("Kxx", 20, None, 10)
        store.write_tile("Kxx", 0, 0, np.ones((10, 10), np.float32))
    with TensorStoreGramStore(url, "w") as store:
        store.create("Kxx", 20, None, 10)
        assert not store.tile_done("Kxx", 0, 0)
        assert np.isnan(store.read("Kxx")).all()


def test_race_loser_does_not_clobber_attrs(tmp_path):
    """A second creator with a different batch_size must be refused and
    must NOT overwrite the winner's batch_size attrs (the shared done
    bitmap is indexed in the winner's units)."""
    import pytest
    path = str(tmp_path / "g")
    with TensorStoreGramStore(path) as store:
        store.create("Kxx", 40, None, 10)
    with TensorStoreGramStore(path) as store2:
        with pytest.raises(ValueError, match="batch_size=10"):
            store2.create("Kxx", 40, None, 20)
    with TensorStoreGramStore(path) as store3:
        assert store3.batch_size("Kxx") == 10   # attrs intact


def test_foreign_array_without_bitmap(tmp_path):
    """An array created by other zarr tooling (no _done) must be usable:
    create() resumes onto it, done_mask starts all-zero, write_tile
    lazily creates the bitmap; a read-only open reports nothing done."""
    import tensorstore as ts
    path = str(tmp_path / "g")
    ts.open({"driver": "zarr",
             "kvstore": {"driver": "file", "path": f"{path}/Kxx"},
             "metadata": {"shape": [20, 20], "chunks": [10, 10],
                          "dtype": "<f4", "fill_value": float("nan")},
             "create": True}).result()

    with TensorStoreGramStore(path, "r") as ro:
        assert ro.done_mask("Kxx").sum() == 0
        assert not ro.tile_done("Kxx", 0, 0)

    with TensorStoreGramStore(path) as store:
        store.create("Kxx", 20, None, 10)     # resume onto foreign array
        assert store.done_mask("Kxx").sum() == 0
        store.write_tile("Kxx", 0, 10, np.ones((10, 10), np.float32))
        assert store.tile_done("Kxx", 0, 10)


def test_dataset_names_url_store(tmp_path):
    """URL-form stores have no local directory: names come through the
    kvstore listing."""
    with TensorStoreGramStore(f"file://{tmp_path}/g", "w") as store:
        store.create("Kxx", 10, None, 5)
        store.create("Kv_diag", 10, None, 5, diag=True)
        assert sorted(store.dataset_names()) == ["Kv_diag", "Kxx"]


def test_upper_triangle_scan_matches_full(tmp_path):
    """The halved-read upper-triangle scan finds exactly the tiles the
    full scan finds in the upper triangle."""
    with TensorStoreGramStore(str(tmp_path / "g")) as store:
        store.create("Kxx", 30, None, 10)
        store.write_tile("Kxx", 0, 0, np.ones((10, 10), np.float32))
        store.write_tile("Kxx", 10, 20, np.ones((10, 10), np.float32))
        full = {tuple(t) for t in store.missing_tiles("Kxx")}
        upper = {tuple(t) for t in
                 store.missing_tiles("Kxx", upper_triangle_only=True)}
        assert upper == {t for t in full if t[1] >= t[0]}
        assert (10, 0) in full and (10, 0) not in upper


def test_h5_readonly_foreign_file_bitmap(tmp_path):
    """A reference-tooling h5 file (no _done group) opened read-only must
    report nothing done instead of raising 'no write intent'."""
    import h5py
    from cnn_gp_tpu.data.store import GramStore
    path = str(tmp_path / "ref.h5")
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("Kxx", shape=(1, 20, 20), dtype=np.float32,
                              fillvalue=np.nan, chunks=(1, 10, 10))
        ds.attrs["batch_size"] = 10
    with GramStore(path, "r") as store:
        assert store.done_mask("Kxx").sum() == 0
        assert not store.tile_done("Kxx", 0, 10)
        assert len(store.missing_tiles("Kxx")) == 4
