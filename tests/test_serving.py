"""Posterior persistence + serving (cnn_gp_tpu/serving.py).

The capability under test (no reference counterpart — the reference
re-runs its O(N^3) LAPACK solve in every prediction process,
reference: exp_mnist_resnet/classify_gp.py:17-27): a posterior solved by
`classify_device_large` round-trips through the .npz artifact and serves
identical predictions — and, after a solve-free factor rebuild,
oracle-accurate variances — in a fresh consumer.
"""

import jax
import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.ops import solve as solve_ops
from cnn_gp_tpu.parallel import classify_device_large, gram_in_memory
from cnn_gp_tpu.serving import (FORMAT_VERSION, GPPredictor, load_posterior,
                                save_posterior)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    from cnn_gp_tpu.parallel import make_mesh
    return make_mesh()


@pytest.fixture(scope="module")
def model():
    return G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(3), G.ReLU(),
                        G.Conv2d(8, padding=0))


@pytest.fixture(scope="module")
def solved(model, mesh, tmp_path_factory):
    """One classify_device_large run + its saved posterior artifact."""
    x, y, zx, zy = synthetic_arrays(n_train=96, n_test=32, shape=(1, 8, 8),
                                    n_classes=4)
    accs, info = classify_device_large(model, x, y, (zx, zy),
                                       batch_size=16, block=32,
                                       jitter=1e-6, mesh=mesh,
                                       verbose=False)
    path = save_posterior(
        tmp_path_factory.mktemp("posterior") / "p",
        train_x=x, alpha=info["alpha"], scalings=info["scalings"],
        jitter_raw=info["jitter_raw"], config_name="unit-test")
    return dict(x=x, y=y, zx=zx, zy=zy, accs=accs, info=info, path=path)


def test_roundtrip_fields(solved):
    p = load_posterior(solved["path"])
    assert solved["path"].endswith(".npz")
    np.testing.assert_array_equal(p.train_x, solved["x"])
    np.testing.assert_array_equal(p.alpha, solved["info"]["alpha"])
    np.testing.assert_array_equal(p.scalings, solved["info"]["scalings"])
    assert p.jitter_raw == solved["info"]["jitter_raw"]
    assert p.config_name == "unit-test"
    assert p.n == len(solved["x"])
    assert "poly" in p.settings_snapshot     # provenance recorded


def test_scores_only_artifact(tmp_path):
    """scalings are optional (mean-only serving) and enforced by
    prepare_variances; bad shapes are refused at save time."""
    x = np.zeros((4, 1, 5, 5), np.float32)
    a = np.zeros((4, 3))
    path = save_posterior(tmp_path / "m.npz", train_x=x, alpha=a)
    p = load_posterior(path)
    assert p.scalings is None
    pred = GPPredictor(G.Sequential(G.Conv2d(5, padding=0)), p)
    with pytest.raises(ValueError, match="scalings"):
        pred.prepare_variances()
    with pytest.raises(RuntimeError, match="prepare_variances"):
        pred.variances(x)
    with pytest.raises(ValueError, match="mismatch"):
        save_posterior(tmp_path / "bad", train_x=x, alpha=a[:2])
    with pytest.raises(ValueError, match="scalings"):
        save_posterior(tmp_path / "bad2", train_x=x, alpha=a,
                       scalings=np.ones(3))


def test_newer_format_refused(tmp_path, solved):
    data = dict(np.load(solved["path"], allow_pickle=False))
    data["format_version"] = np.int64(FORMAT_VERSION + 1)
    np.savez(tmp_path / "future.npz", **data)
    with pytest.raises(ValueError, match="newer"):
        load_posterior(tmp_path / "future.npz")


def test_served_predictions_identical(model, solved):
    """A fresh predictor over the loaded artifact reproduces the solving
    run's predictions exactly (same tile size => same float32 sweeps)."""
    p = load_posterior(solved["path"])
    pred = GPPredictor(model, p, batch_size=16)
    np.testing.assert_array_equal(pred.classify(solved["zx"]),
                                  solved["info"]["predictions"][0])
    # and the scores themselves match an explicit float64 Kzx @ alpha
    kzx = np.asarray(gram_in_memory(model, solved["zx"], solved["x"],
                                    batch_size=16, progress=False),
                     np.float64)
    want = kzx @ p.alpha
    got = pred.scores(solved["zx"])
    assert np.max(np.abs(got - want)) < 2e-5 * np.abs(want).max()


def test_served_variances_match_oracle(model, mesh, solved):
    """prepare_variances rebuilds the factor WITHOUT a solve; variances
    then match the float64 oracle on the same jittered system."""
    p = load_posterior(solved["path"])
    pred = GPPredictor(model, p, batch_size=16)
    pred.prepare_variances(mesh=mesh, block=32)
    got = pred.variances(solved["zx"])

    kxx = np.asarray(gram_in_memory(model, solved["x"], batch_size=16,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(model, solved["zx"], solved["x"],
                                    batch_size=16, progress=False),
                     np.float64)
    kzz = np.ascontiguousarray(np.diagonal(np.asarray(
        gram_in_memory(model, solved["zx"], batch_size=16,
                       progress=False), np.float64)))
    want = solve_ops.predictive_variance(kxx, kzx, kzz,
                                         jitter=p.jitter_raw)
    scale = float(np.mean(np.diagonal(kxx)))
    assert np.max(np.abs(got - want)) < 1e-5 * scale
    assert (got >= 0).all()


def test_settings_mismatch_refused(model, solved):
    """A posterior solved under different kernel-lowering settings is a
    different kernel — construction refuses it unless overridden."""
    from cnn_gp_tpu import settings
    p = load_posterior(solved["path"])
    with settings.override(acos_impl="exact"):
        with pytest.raises(ValueError, match="lowering settings"):
            GPPredictor(model, p)
        pred = GPPredictor(model, p, allow_settings_mismatch=True)
    # matching settings construct cleanly
    GPPredictor(model, p)
    del pred


def test_empty_query_batches(model, mesh, solved):
    """Zero-row query batches are served (not a trace-time TypeError)."""
    p = load_posterior(solved["path"])
    pred = GPPredictor(model, p, batch_size=16)
    empty = np.zeros((0,) + p.train_x.shape[1:], np.float32)
    assert pred.scores(empty).shape == (0, p.alpha.shape[1])
    assert pred.classify(empty).shape == (0,)
    pred.prepare_variances(mesh=mesh, block=32)
    assert pred.variances(empty).shape == (0,)


def test_bad_alpha_rank_refused(tmp_path):
    x = np.zeros((4, 1, 5, 5), np.float32)
    with pytest.raises(ValueError, match="n_classes"):
        save_posterior(tmp_path / "r1", train_x=x, alpha=np.zeros(4))


@pytest.mark.slow
def test_serving_bench_script():
    """scripts/serving_bench smoke: solves a tiny synthetic posterior,
    measures mean + variance query throughput, prints the JSON line."""
    import json
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-m", "scripts.serving_bench",
         "--n_train=64", "--batch_size=16", "--block=16",
         "--query_batch=16", "--rounds=2", "--config=mnist_as_tf"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo").stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    assert d["n_train"] == 64
    assert d["mean_queries_per_s"] > 0
    assert d["variance_queries_per_s"] > 0


def test_factor_cache_roundtrip(model, mesh, solved, tmp_path):
    """The opt-in on-disk factor cache: first prepare writes it, a fresh
    predictor loads it instead of reassembling, and cached-factor
    variances are bit-identical to the rebuilt-factor ones (same factor
    values, same whitening programs)."""
    p = load_posterior(solved["path"])
    cache = str(tmp_path / "fcache")

    pred1 = GPPredictor(model, p, batch_size=16)
    pred1.prepare_variances(mesh=mesh, block=32, factor_cache=cache)
    want = pred1.variances(solved["zx"])
    import os
    assert os.path.exists(os.path.join(cache, "l.npy"))
    assert os.path.exists(os.path.join(cache, "meta.json"))

    pred2 = GPPredictor(model, p, batch_size=16)
    # poison rebuild: loading must NOT reassemble
    import cnn_gp_tpu.parallel.device_large as dl
    real = dl.rebuild_factor
    try:
        dl.rebuild_factor = None
        pred2.prepare_variances(mesh=mesh, block=32, factor_cache=cache)
    finally:
        dl.rebuild_factor = real
    got = pred2.variances(solved["zx"])
    np.testing.assert_array_equal(got, want)


def test_factor_cache_mismatch_refused(model, mesh, solved, tmp_path):
    """A PRESENT cache that does not match the requested geometry or the
    posterior content is an error, not a silent rebuild — the stale
    O(N^2) file on disk is exactly what the user thinks they are using."""
    p = load_posterior(solved["path"])
    cache = str(tmp_path / "fcache")
    pred = GPPredictor(model, p, batch_size=16)
    pred.prepare_variances(mesh=mesh, block=32, factor_cache=cache)

    with pytest.raises(ValueError, match="does not match"):
        GPPredictor(model, p, batch_size=16).prepare_variances(
            mesh=mesh, block=16, factor_cache=cache)    # wrong block

    # wrong posterior content (scalings perturbed)
    import dataclasses
    p2 = dataclasses.replace(p, scalings=p.scalings * 1.001)
    with pytest.raises(ValueError, match="does not match"):
        GPPredictor(model, p2, batch_size=16).prepare_variances(
            mesh=mesh, block=32, factor_cache=cache)

    # wrong MODEL hyperparameters with identical posterior/scalings: a
    # differently-fitted kernel over the same train_x must not match the
    # stale factor (ADVICE r4: save_leaves/load_leaves makes this routine)
    model2 = G.Sequential(
        G.Conv2d(3, var_weight=2.0, learnable=True), G.ReLU(),
        G.Conv2d(3), G.ReLU(), G.Conv2d(8, padding=0))
    with pytest.raises(ValueError, match="does not match"):
        GPPredictor(model2, p, batch_size=16).prepare_variances(
            mesh=mesh, block=32, factor_cache=cache)

    # absent cache dir: quiet rebuild + write_cache=False leaves nothing
    cache2 = str(tmp_path / "other")
    GPPredictor(model, p, batch_size=16).prepare_variances(
        mesh=mesh, block=32, factor_cache=cache2, write_cache=False)
    import os
    assert not os.path.exists(cache2)
