"""Fully device-resident large-N classification (device_large.py).

The matrix-free pieces (regenerated-tile matvecs) are checked against
explicitly materialised Grams, and the whole pipeline against the float64
scipy solve the reference uses (reference:
exp_mnist_resnet/classify_gp.py:17-27) — on a real paper-config kernel at
its ~1e12 value scale.
"""

import jax
import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import (classify_device_large, gram_in_memory,
                                 gram_matvec_regen, make_mesh, scores_regen)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    return make_mesh()


@pytest.fixture(scope="module")
def small_model():
    return G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))


def test_matvec_regen_matches_explicit(small_model):
    """Scaled matrix-free matvec == (D^-1/2 K D^-1/2 with unit diag) @ a."""
    x, _, _, _ = synthetic_arrays(n_train=70, n_test=0, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(small_model, x, batch_size=16,
                                  progress=False), np.float64)
    s = (1.0 / np.sqrt(np.diagonal(k) + 0.1)).astype(np.float32)
    m = s[:, None] * k * s[None, :]
    np.fill_diagonal(m, 1.0)
    a = np.random.RandomState(0).randn(70, 5).astype(np.float32)
    got = gram_matvec_regen(small_model, x, a, batch_size=16, s=s)
    np.testing.assert_allclose(got, m @ a, rtol=2e-5, atol=2e-5)


def test_matvec_regen_raw(small_model):
    """Unscaled matrix-free matvec == K @ a (padding garbage must not
    leak through the pad rows of a)."""
    x, _, _, _ = synthetic_arrays(n_train=37, n_test=0, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(small_model, x, batch_size=16,
                                  progress=False), np.float64)
    a = np.random.RandomState(1).randn(37, 3).astype(np.float32)
    got = gram_matvec_regen(small_model, x, a, batch_size=16)
    np.testing.assert_allclose(got, k @ a, rtol=2e-5,
                               atol=2e-5 * np.abs(k @ a).max())


def test_scores_regen_matches_explicit(small_model):
    x, _, z, _ = synthetic_arrays(n_train=50, n_test=21, shape=(1, 7, 7))
    kzx = np.asarray(gram_in_memory(small_model, z, x, batch_size=16,
                                    progress=False), np.float64)
    a = np.random.RandomState(2).randn(50, 4).astype(np.float32)
    got = scores_regen(small_model, z, x, a, batch_size=16)
    np.testing.assert_allclose(got, kzx @ a, rtol=2e-5,
                               atol=2e-5 * np.abs(kzx @ a).max())


def test_classify_large_matches_scipy(mesh):
    """End to end on a real paper-config Gram (~1e12 values): the fully
    device-resident path must reproduce the float64 scipy pipeline's
    predictions exactly."""
    import configs
    model = configs.load("mnist_paper_convnet_gp").initial_model
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=64, n_test=24, shape=(1, 28, 28), seed=11)
    va_x, va_y = te_x[:12], te_y[:12]

    accs, info = classify_device_large(
        model, tr_x, tr_y, (va_x, va_y), (te_x, te_y),
        batch_size=16, block=16, mesh=mesh, verbose=False)
    assert info["rel_residual"] < 1e-4, info

    # reference pipeline: explicit float64 Grams + scipy solve
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=16,
                                    progress=False), np.float64)
    assert kxx.flat[0] > 1e11           # genuinely at the paper's scale
    a_ref = solve.solve_gp(kxx, solve.one_hot_targets(tr_y), method="scipy")
    for (xz, yz), pred, acc in zip([(va_x, va_y), (te_x, te_y)],
                                   info["predictions"], accs):
        kzx = np.asarray(gram_in_memory(model, xz, tr_x, batch_size=16,
                                        progress=False), np.float64)
        np.testing.assert_array_equal(pred, solve.predict(kzx, a_ref))
        assert acc == solve.accuracy(solve.predict(kzx, a_ref), yz)


def test_classify_large_padding_edges(mesh):
    """N not divisible by tile, block, or device count; tile cover beyond
    the factor grid (pad_to alignment) must still solve correctly."""
    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=37, n_test=9, shape=(1, 7, 7), seed=3)
    accs, info = classify_device_large(
        model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=8, jitter=1e-6, mesh=mesh, verbose=False)
    assert info["rel_residual"] < 1e-4
    assert info["n_pad"] % 16 == 0 and info["n_pad"] % 8 == 0
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=16,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(model, te_x, tr_x, batch_size=16,
                                    progress=False), np.float64)
    # jitter is scale-normalised (relative to the mean diagonal)
    jit_raw = 1e-6 * float(np.mean(np.diagonal(kxx)))
    a_ref = solve.solve_gp(kxx, solve.one_hot_targets(tr_y),
                           jitter=jit_raw, method="scipy")
    np.testing.assert_array_equal(info["predictions"][0],
                                  solve.predict(kzx, a_ref))


def test_classify_large_floor_tol(mesh, small_model):
    """The floor-covering tol contract: a tol above the achieved residual
    means NO refinement sweep runs (the sweep costs an assembly-priced
    matvec pass at scale), while the unrefined residual is still measured
    and reported — refinement is skipped by evidence, never blindly."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=48, n_test=8, shape=(1, 7, 7), seed=7)
    accs, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=16, mesh=mesh, tol=1.0, refine_iters=3,
        verbose=False)
    assert info["refinements"] == 0
    assert info["rel_residual"] == info["rel_residual_unrefined"] > 0.0
    # and with an unreachable tol the cap still bounds the sweeps
    _, info2 = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=16, mesh=mesh, tol=0.0, refine_iters=2,
        verbose=False)
    assert info2["refinements"] <= 2
    assert info2["rel_residual"] <= info2["rel_residual_unrefined"]


def test_assemble_chunked_matches_explicit(small_model):
    """The donated chunked lower-triangle assembly (with idempotent
    pad-tile rewrites) must equal the explicitly scaled Gram's lower
    triangle regardless of chunk size, with an exact identity pad block
    and zeros above the diagonal.  n=43 makes the tile cover (48) exceed
    n, so pad rows inside a written tile are exercised too."""
    from cnn_gp_tpu.parallel.device_large import (_assemble_scaled,
                                                  _lower_offsets)
    from cnn_gp_tpu.parallel.gram import _pad_to_multiple
    import jax.numpy as jnp
    n = 43
    x, _, _, _ = synthetic_arrays(n_train=n, n_test=0, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(small_model, x, batch_size=8,
                                  progress=False), np.float64)
    s64 = 1.0 / np.sqrt(np.diagonal(k))
    want = s64[:, None] * k * s64[None, :]
    np.fill_diagonal(want, 1.0)
    mesh1 = make_mesh(n_devices=1)
    n_pad = 48
    s_pad = np.ones(n_pad, np.float32)
    s_pad[:n] = s64
    x_all = jnp.asarray(_pad_to_multiple(np.asarray(x, np.float32), 8))
    for tiles_per_call in (3, 7, 1000):
        got = np.asarray(_assemble_scaled(
            small_model, x_all, jnp.asarray(s_pad), _lower_offsets(n, 8),
            8, n, n_pad, mesh1, tiles_per_call=tiles_per_call))
        np.testing.assert_allclose(np.tril(got[:n, :n]), np.tril(want),
                                   rtol=2e-5, atol=2e-5)
        eye = np.eye(n_pad, dtype=np.float32)
        assert (got[n:] == eye[n:]).all()          # identity pad rows
        assert (np.triu(got, 1)[:, n:] == 0).all()  # pad cols above diag
        # no tile with tile-col > tile-row is ever written: everything at
        # least one full tile above the diagonal stays at the init zeros
        assert (np.triu(got, 8) == 0).all()


def test_chunked_matvec_weight_padding(small_model):
    """The bounded-chunk matvec/scores sweeps must accumulate exactly once
    per tile for every chunk size — tail chunks are padded with weight-0
    tiles (a repeat-pad would double-count, unlike assembly's idempotent
    rewrites)."""
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.parallel.device_large import (_matvec_scan,
                                                  _rect_offsets,
                                                  _scores_scan,
                                                  _upper_offsets)
    from cnn_gp_tpu.parallel.gram import _pad_to_multiple
    import jax
    import jax.numpy as jnp
    n = 40
    x, _, z, _ = synthetic_arrays(n_train=n, n_test=16, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(small_model, x, batch_size=8,
                                  progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(small_model, z, x, batch_size=8,
                                    progress=False), np.float64)
    s = (1.0 / np.sqrt(np.diagonal(k))).astype(np.float32)
    m = s[:, None] * k * s[None, :]
    np.fill_diagonal(m, 1.0)
    a = np.random.RandomState(3).randn(n, 4).astype(np.float32)
    x_all = jnp.asarray(_pad_to_multiple(np.asarray(x, np.float32), 8))
    z_all = jnp.asarray(_pad_to_multiple(np.asarray(z, np.float32), 8))
    a_pad = jnp.asarray(np.concatenate([a, np.zeros((x_all.shape[0] - n, 4),
                                                    np.float32)]))
    snap = settings.snapshot()
    with jax.default_matmul_precision("highest"):
        for c in (1, 4, 7, 10**6):
            got = np.asarray(_matvec_scan(
                small_model, x_all, jnp.asarray(s), _upper_offsets(n, 8),
                a_pad, 8, n, snap, tiles_per_call=c))[:n]
            np.testing.assert_allclose(got, m @ a, rtol=2e-5, atol=2e-5)
            gs = np.asarray(_scores_scan(
                small_model, z_all, x_all, _rect_offsets(16, n, 8),
                a_pad, 8, snap, tiles_per_call=c))[:16]
            np.testing.assert_allclose(
                gs, kzx @ a, rtol=2e-5, atol=2e-5 * np.abs(kzx @ a).max())


def test_predictive_variances_match_oracle(mesh, small_model):
    """Matrix-free device variances == the float64 cho_factor oracle
    (ops.solve.predictive_variance) on explicit Grams — including the
    jitter entering through the equilibration scaling."""
    from cnn_gp_tpu.ops.solve import predictive_variance
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=52, n_test=18, shape=(1, 7, 7), seed=9)
    jitter = 1e-4
    accs, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=8, block=8, jitter=jitter, mesh=mesh,
        variances=True, verbose=False)
    kxx = np.asarray(gram_in_memory(small_model, tr_x, batch_size=8,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(small_model, te_x, tr_x, batch_size=8,
                                    progress=False), np.float64)
    kzz = np.asarray(gram_in_memory(small_model, te_x, batch_size=8,
                                    progress=False), np.float64)
    jr = jitter * float(np.mean(np.diagonal(kxx)))
    want = predictive_variance(kxx, kzx, np.diagonal(kzz), jitter=jr)
    got = info["variances"][0]
    assert got.shape == (18,)
    assert (got >= 0).all()
    scale = float(np.diagonal(kzz).mean())
    np.testing.assert_allclose(got, want, atol=5e-6 * scale, rtol=2e-4)
    # sanity vs the naive inverse formula too
    naive = np.diagonal(kzz) - np.einsum(
        "ij,ij->i", kzx, kzx @ np.linalg.inv(kxx + jr * np.eye(52)))
    np.testing.assert_allclose(want, np.maximum(naive, 0.0),
                               atol=1e-8 * scale)


def test_lpd_matches_oracle(mesh, small_model):
    """Held-out log predictive density through the device pipeline
    (info scores + variances + jitter_raw -> ops.solve.gaussian_lpd)
    == the one-Cholesky float64 oracle (ops.solve.log_predictive_density)
    on explicit Grams.  This is the metric the type-II ML story is
    evaluated on (VERDICT r4 item 1); the gate keeps the two code paths
    measuring the same quantity."""
    from cnn_gp_tpu.ops.solve import gaussian_lpd, log_predictive_density
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=52, n_test=18, shape=(1, 7, 7), seed=9)
    jitter = 1e-4
    _, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=8, block=8, jitter=jitter, mesh=mesh,
        variances=True, verbose=False)
    got_m, got_se, got_pp = gaussian_lpd(
        info["scores"][0], info["variances"][0], te_y, info["jitter_raw"])
    kxx = np.asarray(gram_in_memory(small_model, tr_x, batch_size=8,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(small_model, te_x, tr_x, batch_size=8,
                                    progress=False), np.float64)
    kzz_d = np.asarray(small_model(te_x, diag=True), np.float64)
    want_m, want_se, want_pp = log_predictive_density(
        kxx, kzx, kzz_d, tr_y, te_y, jitter_rel=jitter)
    assert got_pp.shape == want_pp.shape == (18,)
    np.testing.assert_allclose(got_pp, want_pp, rtol=2e-3,
                               atol=2e-3 * np.abs(want_pp).mean())
    np.testing.assert_allclose(got_m, want_m, rtol=2e-3)
    np.testing.assert_allclose(got_se, want_se, rtol=5e-3)
    # density sanity: standardized residuals are O(1), so per-point LPD
    # must be finite and the SE positive on >1 points
    assert np.isfinite(got_pp).all() and got_se > 0


def test_variances_narrow_and_unaligned_cb(mesh, small_model):
    """The cross-covariance column-block width must be clamped to a
    multiple of the tile size and at least one tile wide — cb < b
    previously produced a malformed z-block slice (review regression)."""
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.ops.solve import predictive_variance
    from cnn_gp_tpu.parallel.device_large import (_diag_scan_jit,
                                                  _predictive_variances)
    from cnn_gp_tpu.parallel.gram import _pad_to_multiple
    from cnn_gp_tpu.parallel.chol_dist import _ShardedFactor
    import jax.numpy as jnp
    b = 8
    tr_x, _, te_x, _ = synthetic_arrays(n_train=40, n_test=24,
                                        shape=(1, 7, 7), seed=2)
    n = len(tr_x)
    kxx = np.asarray(gram_in_memory(small_model, tr_x, batch_size=b,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(small_model, te_x, tr_x, batch_size=b,
                                    progress=False), np.float64)
    kzz = np.asarray(small_model(te_x, diag=True), np.float64)
    want = predictive_variance(kxx, kzx, kzz)
    s64 = 1.0 / np.sqrt(np.diagonal(kxx))
    factor = _ShardedFactor(mesh, n, 8, pad_to=b)
    x_all = jnp.asarray(_pad_to_multiple(np.asarray(tr_x, np.float32), b))
    s_pad = np.ones(factor.n_pad, np.float32)
    s_pad[:n] = s64
    from cnn_gp_tpu.parallel.device_large import (_assemble_scaled,
                                                  _lower_offsets)
    k = _assemble_scaled(small_model, x_all, jnp.asarray(s_pad),
                         _lower_offsets(n, b), b, n, factor.n_pad, mesh)
    factor._factorize_dev(k)
    z_all = jnp.asarray(_pad_to_multiple(np.asarray(te_x, np.float32), b))
    snap = settings.snapshot()
    kzz_pad = np.zeros(z_all.shape[0])
    kzz_pad[:len(te_x)] = kzz
    s_dev = jnp.asarray(s_pad[:x_all.shape[0]])
    scale = float(kzz.mean())
    for cb in (4, 12, 8, 16, 1000):   # < b, unaligned, == b, 2b, > m_pad
        got = _predictive_variances(factor, small_model, x_all, z_all,
                                    s_dev, kzz_pad, b, n, snap,
                                    cb=cb)[:len(te_x)]
        np.testing.assert_allclose(got, want, atol=5e-6 * scale,
                                   rtol=2e-4)


def test_scores_regen_empty_split(small_model):
    """A zero-example split must sweep nothing and return an empty result
    (the chunked sweeps previously raised on an empty manifest)."""
    x, _, _, _ = synthetic_arrays(n_train=24, n_test=0, shape=(1, 7, 7))
    a = np.ones((24, 3), np.float32)
    out = scores_regen(small_model, x[:0], x, a, batch_size=8)
    assert out.shape == (0, 3)


@pytest.mark.slow
def test_classify_large_medium_n(mesh, small_model, tmp_path):
    """Round-2 VERDICT #3: the fully device-resident path at medium N on
    the 8-device mesh — N=2333 with tile size 48 and factor block 128, so
    nothing divides anything (tile cover 2352 vs factor pad, 19 factor
    blocks over 8 devices, uneven tail tile) and each device owns
    multiple blocks.  Predictions must be scipy-float64-identical and the
    residual at the f32 floor.  The saved posterior must then serve
    bit-identical predictions and variances at the same shape (the
    rebuilt factor goes through the identical assembly arithmetic)."""
    n = 2333
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=n, n_test=128, shape=(1, 7, 7), seed=21)
    accs, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=48, block=128, jitter=1e-6, mesh=mesh,
        refine_iters=3, variances=True, verbose=False)
    # the f32 matvec floor scales with cond(M) too; 1e-4 bounds it for
    # this small-model Gram (paper Grams measured tighter, BASELINE.md)
    assert info["rel_residual"] < 1e-4, info["rel_residual"]

    kxx = np.asarray(gram_in_memory(small_model, tr_x, batch_size=48,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(small_model, te_x, tr_x, batch_size=48,
                                    progress=False), np.float64)
    jit_raw = 1e-6 * float(np.mean(np.diagonal(kxx)))
    a_ref = solve.solve_gp(kxx.copy(), solve.one_hot_targets(tr_y),
                           jitter=jit_raw, method="scipy")
    np.testing.assert_array_equal(info["predictions"][0],
                                  solve.predict(kzx, a_ref))
    # variances against the float64 oracle
    from cnn_gp_tpu.ops.solve import predictive_variance
    kzz = np.asarray(small_model(te_x, diag=True), np.float64)
    want = predictive_variance(kxx, kzx, kzz, jitter=jit_raw)
    scale = float(kzz.mean())
    np.testing.assert_allclose(info["variances"][0], want,
                               atol=5e-5 * scale, rtol=2e-3)

    # serving round-trip at the same awkward medium-N shape: identical
    # tile size + scalings => bit-identical sweeps and rebuilt factor
    from cnn_gp_tpu.serving import GPPredictor, load_posterior, \
        save_posterior
    path = save_posterior(tmp_path / "medium", train_x=tr_x,
                          alpha=info["alpha"], scalings=info["scalings"],
                          jitter_raw=info["jitter_raw"])
    pred = GPPredictor(small_model, load_posterior(path), batch_size=48)
    np.testing.assert_array_equal(pred.classify(te_x),
                                  info["predictions"][0])
    pred.prepare_variances(mesh=mesh, block=128)
    np.testing.assert_array_equal(pred.variances(te_x),
                                  info["variances"][0])


def test_classify_large_empty_split_variances(mesh, small_model):
    """variances=True with a zero-length split must return an empty
    variance array instead of tracing a b-sized slice of a 0-row z_all
    (advisor regression, round 3)."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=24, n_test=8, shape=(1, 7, 7), seed=4)
    accs, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x[:0], te_y[:0]), (te_x, te_y),
        batch_size=8, block=8, jitter=1e-6, mesh=mesh,
        variances=True, verbose=False)
    assert info["variances"][0].shape == (0,)
    assert info["variances"][1].shape == (8,)
    assert np.isfinite(info["variances"][1]).all()
    assert len(info["predictions"][0]) == 0


def test_classify_large_single_device():
    """The real deployment shape: one chip, one-device mesh."""
    mesh1 = make_mesh(n_devices=1)
    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=48, n_test=16, shape=(1, 7, 7), seed=5)
    accs, info = classify_device_large(
        model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=16, jitter=1e-6, mesh=mesh1, verbose=False)
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=16,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(model, te_x, tr_x, batch_size=16,
                                    progress=False), np.float64)
    jit_raw = 1e-6 * float(np.mean(np.diagonal(kxx)))
    a_ref = solve.solve_gp(kxx, solve.one_hot_targets(tr_y),
                           jitter=jit_raw, method="scipy")
    np.testing.assert_array_equal(info["predictions"][0],
                                  solve.predict(kzx, a_ref))


def test_log_evidence_matches_oracle(mesh, small_model):
    """The device factor's log marginal likelihood (quadratic form from
    the refined solution + log-determinant from the factor's diagonal
    blocks, equilibration-corrected) == the float64 cho_factor oracle
    (ops.solve.log_marginal_likelihood) — with and without jitter, and at
    an N that is not a multiple of the block or device count (pad rows
    must contribute exactly zero to the log-determinant)."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=53, n_test=9, shape=(1, 7, 7), seed=21)
    kxx = np.asarray(gram_in_memory(small_model, tr_x, batch_size=8,
                                    progress=False), np.float64)
    y = solve.one_hot_targets(tr_y)
    for jitter in (0.0, 1e-4):
        accs, info = classify_device_large(
            small_model, tr_x, tr_y, (te_x, te_y),
            batch_size=8, block=8, jitter=jitter, mesh=mesh, verbose=False)
        want = solve.log_marginal_likelihood(kxx, y, jitter_rel=jitter)
        assert np.isfinite(info["log_evidence"])
        np.testing.assert_allclose(info["log_evidence"], want,
                                   rtol=5e-4, atol=5e-3 * abs(want))
        # the logdet leg alone, vs an explicit float64 slogdet
        kj = kxx + jitter * np.mean(np.diagonal(kxx)) * np.eye(len(kxx))
        sign, want_logdet = np.linalg.slogdet(kj)
        assert sign > 0
        np.testing.assert_allclose(info["logdet"], want_logdet, rtol=1e-4)


def test_log_evidence_paper_scale(mesh):
    """Evidence stays correct at the paper configs' ~1e12 kernel scale:
    the factor diagonal is of the equilibrated (unit-diagonal) system so
    its logs are O(1) in float32; the 1e12 scale re-enters only through
    the float64 host-side ``-2 sum log s`` correction."""
    import configs
    model = configs.load("mnist_paper_convnet_gp").initial_model
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=48, n_test=8, shape=(1, 28, 28), seed=13)
    accs, info = classify_device_large(
        model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=16, mesh=mesh, verbose=False)
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=16,
                                    progress=False), np.float64)
    assert kxx.flat[0] > 1e11
    want = solve.log_marginal_likelihood(kxx, solve.one_hot_targets(tr_y))
    np.testing.assert_allclose(info["log_evidence"], want,
                               rtol=5e-4, atol=5e-3 * abs(want))


@pytest.mark.slow
def test_model_selection_script(tmp_path):
    """scripts/model_selection ranks kernels by training-split evidence
    and prints a selection line (smoke: two cheap MNIST-shaped models on
    the virtual mesh)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-m", "scripts.model_selection",
         "--n_train=48", "--n_test=16", "--batch_size=16", "--block=16",
         "--models=mnist_paper_convnet_gp,mnist_paper_residual_cnn_gp"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo").stdout
    assert "evidence ranking:" in out, out
    assert "selected " in out, out
    # every reported evidence must be finite (printed as a number,
    # not nan/inf)
    assert "nan" not in out and "inf" not in out, out


def test_rows_matvec_matches_explicit(small_model):
    """Selected block-rows of the sampled-residual matvec must equal the
    corresponding rows of the explicit scaled system (pad rows included:
    the pinned unit diagonal maps zero-padded weights to zero)."""
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.parallel.device_large import _rows_matvec
    from cnn_gp_tpu.parallel.gram import _pad_to_multiple
    import jax
    import jax.numpy as jnp
    n, b = 70, 16
    x, _, _, _ = synthetic_arrays(n_train=n, n_test=0, shape=(1, 7, 7))
    k = np.asarray(gram_in_memory(small_model, x, batch_size=b,
                                  progress=False), np.float64)
    s = (1.0 / np.sqrt(np.diagonal(k))).astype(np.float32)
    m = s[:, None] * k * s[None, :]
    np.fill_diagonal(m, 1.0)
    a = np.random.RandomState(5).randn(n, 3).astype(np.float32)
    x_all = jnp.asarray(_pad_to_multiple(np.asarray(x, np.float32), b))
    m_pad = x_all.shape[0]
    s_pad = np.ones(m_pad, np.float32)
    s_pad[:n] = s
    a_pad = np.zeros((m_pad, 3), np.float32)
    a_pad[:n] = a
    want = m @ a
    rows_idx = np.asarray([0, 2, 4])          # strict subset of 5 blocks
    with jax.default_matmul_precision("highest"):
        got = np.asarray(_rows_matvec(
            small_model, x_all, jnp.asarray(s_pad), jnp.asarray(a_pad),
            rows_idx, b, n, settings.snapshot(), tiles_per_call=7))
    for pos, i in enumerate(rows_idx):
        i0 = int(i) * b
        hi = min(i0 + b, n)
        np.testing.assert_allclose(got[pos * b:pos * b + (hi - i0)],
                                   want[i0:hi], rtol=2e-5, atol=2e-5)
        if hi < i0 + b:                        # pad rows map to zero
            assert (got[pos * b + (hi - i0):(pos + 1) * b] == 0).all()


def test_sampled_residual_accept_path(mesh, small_model):
    """With a clearing tol the sampled check accepts without a full
    sweep: the reported residual is flagged as an estimate, refinement
    never fires, and predictions are identical to the exact-check run.
    The estimate itself must agree with the exact residual to within
    sampling noise (both measure the same f32-floor quantity)."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=160, n_test=16, shape=(1, 7, 7), seed=21)
    kw = dict(batch_size=16, block=16, mesh=mesh, tol=1.0,
              refine_iters=3, verbose=False)
    accs_s, info_s = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        residual_check="sampled", residual_sample_rows=48,
        residual_sample_seed=0, **kw)
    accs_f, info_f = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        residual_check="full", **kw)
    assert info_s["rel_residual_estimated"] is True
    assert info_s["refinements"] == 0
    assert info_s["rel_residual"] == info_s["rel_residual_sampled"] > 0.0
    assert info_f["rel_residual_estimated"] is False
    np.testing.assert_array_equal(info_s["predictions"][0],
                                  info_f["predictions"][0])
    assert accs_s == accs_f
    # loose band: the residual is f32 accumulation noise, so two
    # measurement paths (sampled-scaled vs full) agree only to sampling
    # + summation-order noise; an order of magnitude is the contract
    ratio = info_s["rel_residual"] / info_f["rel_residual"]
    assert 0.1 < ratio < 10.0, (info_s["rel_residual"],
                                info_f["rel_residual"])


def test_sampled_residual_escalates(mesh, small_model):
    """Near/below tol the sampled check must escalate: refinement
    *corrections* are computed from exact residuals (only the initial
    accept gate and the after-final-correction report use estimates)."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=48, n_test=8, shape=(1, 7, 7), seed=7)
    accs, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=16, mesh=mesh, tol=0.0, refine_iters=2,
        residual_check="sampled", verbose=False)
    assert info["refinements"] >= 1                   # escalation happened
    assert info["rel_residual_sampled"] is not None   # estimate was taken
    assert info["rel_residual"] <= info["rel_residual_unrefined"]
    if info["rel_residual_estimated"]:    # report-only final estimate won
        assert info["rel_residual"] == info["rel_residual_sampled"]
    # the exact-correction contract of the escalated path: predictions
    # match the always-exact run
    _, info_f = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        batch_size=16, block=16, mesh=mesh, tol=0.0, refine_iters=2,
        residual_check="full", verbose=False)
    assert info_f["rel_residual_estimated"] is False
    np.testing.assert_array_equal(info["predictions"][0],
                                  info_f["predictions"][0])


def test_residual_check_validation():
    with pytest.raises(ValueError, match="residual_check"):
        classify_device_large(None, np.zeros((4, 1, 7, 7)), np.zeros(4),
                              residual_check="bogus")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="residual_accept_frac"):
            classify_device_large(None, np.zeros((4, 1, 7, 7)),
                                  np.zeros(4), residual_accept_frac=bad)


def test_residual_accept_frac_gates_the_sweep(mesh, small_model):
    """The accept gate compares the estimate's +3-SE upper confidence
    bound against frac * tol: with a tol that puts the bound at
    0.8 * tol, frac 0.9 accepts (estimate reported, no refinement) and
    frac 0.5 escalates (exact residual reported)."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=160, n_test=16, shape=(1, 7, 7), seed=21)
    kw = dict(batch_size=16, block=16, mesh=mesh, refine_iters=0,
              residual_check="sampled", residual_sample_rows=48,
              residual_sample_seed=0,   # pin: the probe and both gated
              # runs must measure the SAME sampled blocks, else the UCB
              # of a fresh draw can cross the 0.9/0.5 thresholds
              verbose=False)   # refine_iters=0: the gate is the ONLY
    # behavioural difference between the two runs below (an escalated
    # run that also refined could legitimately change predictions)
    # measure the estimate + bound once with an always-clearing tol
    _, probe = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), tol=1.0, **kw)
    est, ucb = (probe["rel_residual_sampled"],
                probe["rel_residual_sampled_ucb"])
    assert ucb >= est > 0.0           # the bound prices sampling error
    assert np.isfinite(ucb)          # 3 sampled blocks -> measurable SE
    tol = ucb / 0.8                   # bound sits at 0.8 * tol
    accs_hi, info_hi = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), tol=tol,
        residual_accept_frac=0.9, **kw)
    accs_lo, info_lo = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), tol=tol,
        residual_accept_frac=0.5, **kw)
    assert info_hi["rel_residual_estimated"] is True    # 0.8 <= 0.9: accept
    assert info_hi["refinements"] == 0
    assert info_hi["rel_residual"] == info_hi["rel_residual_sampled"]
    assert info_lo["rel_residual_estimated"] is False   # 0.8 > 0.5: escalate
    assert info_lo["rel_residual_unrefined"] is not None
    # same solve either way: identical predictions and accuracies
    np.testing.assert_array_equal(info_hi["predictions"][0],
                                  info_lo["predictions"][0])
    assert accs_hi == accs_lo


def test_sampled_pass_skipped_when_gate_cannot_accept(mesh, small_model):
    """With <2 full sampled blocks the bound is unmeasurable, so the
    sampled pass is skipped outright (no wasted device work) and the
    run goes straight to the exact check."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=160, n_test=16, shape=(1, 7, 7), seed=5)
    _, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), batch_size=16, block=16,
        mesh=mesh, tol=1.0, refine_iters=0, residual_check="sampled",
        residual_sample_rows=16, verbose=False)   # k=1 block only
    assert info["rel_residual_sampled"] is None
    assert info["rel_residual_sampled_ucb"] is None
    assert info["rel_residual_estimated"] is False   # exact check ran
    assert info["rel_residual"] == info["rel_residual_unrefined"] > 0.0


def test_sampled_ucb_exact_when_fully_covered(mesh, small_model):
    """When sample_rows covers every block the estimate is the exact
    residual for this measurement program; the bound still prices the
    across-block spread (summation-order noise between programs), so it
    sits above the estimate but stays finite and accepts under a
    clearing tol."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=48, n_test=8, shape=(1, 7, 7), seed=3)
    _, info = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), batch_size=16, block=16,
        mesh=mesh, tol=1.0, refine_iters=1, residual_check="sampled",
        residual_sample_rows=1024, verbose=False)
    assert info["rel_residual_estimated"] is True
    assert (info["rel_residual_sampled_ucb"]
            >= info["rel_residual_sampled"] > 0.0)
    assert np.isfinite(info["rel_residual_sampled_ucb"])
    # and the "estimate" matches the full-sweep residual (different
    # program => different f32 summation order; the residual IS that
    # accumulation noise, so a band is the honest contract)
    _, info_f = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), batch_size=16, block=16,
        mesh=mesh, tol=1.0, refine_iters=1, residual_check="full",
        verbose=False)
    ratio = info["rel_residual_sampled"] / info_f["rel_residual"]
    assert 0.5 < ratio < 2.0, ratio


def test_fused_variance_scores_match_predict_sweep(mesh, small_model):
    """With variances=True the split scores ride the variance pass's
    regenerated cross blocks; they must match the standalone predict
    sweep (and the explicit K_zx @ alpha) — same predictions, scores
    within f32 accumulation noise."""
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=52, n_test=18, shape=(1, 7, 7), seed=9)
    kw = dict(batch_size=8, block=8, jitter=1e-4, mesh=mesh, verbose=False)
    accs_v, info_v = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), variances=True, **kw)
    accs_p, info_p = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), variances=False, **kw)
    np.testing.assert_array_equal(info_v["predictions"][0],
                                  info_p["predictions"][0])
    assert accs_v == accs_p
    # and against the explicit float64 route
    kzx = np.asarray(gram_in_memory(small_model, te_x, tr_x, batch_size=8,
                                    progress=False), np.float64)
    want = kzx @ info_v["alpha"]
    got = scores_regen(small_model, te_x, tr_x,
                       info_v["alpha"].astype(np.float32), batch_size=8)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-5 * scale)
    # the fused path reproduces the same argmax as the f64 scores
    np.testing.assert_array_equal(info_v["predictions"][0],
                                  np.argmax(want, axis=1))


def _corrupt_one_assembly_tile(monkeypatch, i_bad: int, j_bad: int, b: int,
                               eps: float):
    """Monkeypatch `_assemble_scaled` to add ``eps`` to ONE lower-triangle
    tile AFTER real assembly: the factor then decomposes M + E while the
    regeneration matvec measures against the true M — the adversarial
    failure class of the sampled gate (residual ``r = E a`` confined to
    block-rows ``i_bad`` and ``j_bad``; see the detection-limits note in
    `classify_device_large`)."""
    import jax.numpy as jnp
    from jax import lax
    from cnn_gp_tpu.parallel import device_large as dl

    real = dl._assemble_scaled

    def corrupt(*args, **kw):
        k = real(*args, **kw)
        blk = lax.dynamic_slice(k, (i_bad * b, j_bad * b), (b, b))
        return lax.dynamic_update_slice(
            k, blk + jnp.float32(eps), (i_bad * b, j_bad * b))

    monkeypatch.setattr(dl, "_assemble_scaled", corrupt)


def test_injected_tile_error_detection_randomized(mesh, small_model,
                                                  monkeypatch):
    """Error-injection calibration of the sampled accept gate (round-3
    VERDICT #1): corrupt one assembly tile — the failure whose residual
    is CONFINED to two block-rows, invisible unless one of them is
    sampled — and verify, seed by seed, that the randomized gate
    escalates exactly when its sample intersects the corrupted
    block-rows.  The old deterministic evenly-spread sample {0, 15}
    never contained them: it would have missed this corruption on EVERY
    run; the randomized gate catches it at the predicted ~2k/nt rate per
    run and with probability -> 1 across runs."""
    n, b = 256, 16            # nt = 16 block-rows, k = 2 sampled
    i_bad, j_bad = 6, 3       # strictly-lower tile, residual in rows {3, 6}
    from cnn_gp_tpu.parallel.device_large import _sample_row_blocks
    # the deterministic round-3 sample was np.linspace(0, nt-1, k): {0, 15}
    old_det = set(np.unique(np.linspace(0, 15, 2).round().astype(int)))
    assert not (old_det & {i_bad, j_bad})      # the documented blind spot

    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=n, n_test=8, shape=(1, 7, 7), seed=13)
    kw = dict(batch_size=b, block=16, jitter=1e-2, mesh=mesh,
              refine_iters=0, verbose=False)

    # healthy exact residual (the f32 floor), then the corrupted exact
    # residual: the injected signal must be well separated from the floor
    _, info_h = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), residual_check="full", **kw)
    rel_healthy = info_h["rel_residual"]
    _corrupt_one_assembly_tile(monkeypatch, i_bad, j_bad, b, eps=1e-4)
    _, info_c = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y), residual_check="full", **kw)
    rel_corrupt = info_c["rel_residual"]
    assert rel_corrupt > 30 * rel_healthy, (rel_corrupt, rel_healthy)
    tol = float(np.sqrt(rel_healthy * rel_corrupt))   # geometric midpoint

    hits = misses = 0
    for seed in range(12):
        expected_hit = bool(
            set(_sample_row_blocks(16, 2, seed).tolist()) & {i_bad, j_bad})
        _, info = classify_device_large(
            small_model, tr_x, tr_y, (te_x, te_y), tol=tol,
            residual_check="sampled", residual_sample_rows=32,
            residual_sample_seed=seed, **kw)
        assert info["residual_sample_seed"] == seed
        assert (set(np.asarray(info["residual_sampled_blocks"]).tolist())
                == set(_sample_row_blocks(16, 2, seed).tolist()))
        detected = not info["rel_residual_estimated"]
        assert detected == expected_hit, (seed, info["rel_residual_sampled"],
                                          info["rel_residual_sampled_ucb"])
        if detected:
            hits += 1            # escalated: the exact check sees E a
            assert info["rel_residual"] > tol
        else:
            misses += 1          # accepted: the corruption went unsampled
            assert info["rel_residual_sampled"] < tol
    assert hits >= 1 and misses >= 1, (hits, misses)


def test_injected_small_error_caught_by_max_row_gate(mesh, small_model,
                                                     monkeypatch):
    """The max-per-sampled-row statistic catches a localized corruption
    SMALL enough that the mean-square UCB alone would accept it: with the
    corrupted block in the sample, the mean stays under a loose tol but
    the max-row ratio explodes; disabling the gate (huge
    residual_max_row_gate) accepts — proving the max-row statistic, not
    the mean, fired."""
    n, b = 256, 16            # nt = 16, k = 4 sampled
    i_bad, j_bad = 9, 3
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=n, n_test=8, shape=(1, 7, 7), seed=13)
    _corrupt_one_assembly_tile(monkeypatch, i_bad, j_bad, b, eps=1e-4)
    kw = dict(batch_size=b, block=16, jitter=1e-2, mesh=mesh,
              refine_iters=0, residual_check="sampled",
              residual_sample_rows=64, tol=1.0, verbose=False)
    hit_seed, miss_seed = 2, 0          # sample {1,3,4,10} / {4,7,8,11}

    _, info_hit = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        residual_sample_seed=hit_seed, **kw)
    assert info_hit["rel_residual_estimated"] is False        # escalated
    assert info_hit["rel_residual_maxrow_ratio"] > 1e4
    # the mean-square UCB alone WOULD have accepted this corruption
    assert info_hit["rel_residual_sampled_ucb"] <= 1.0

    _, info_off = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        residual_sample_seed=hit_seed, residual_max_row_gate=1e12, **kw)
    assert info_off["rel_residual_estimated"] is True         # gate off

    _, info_miss = classify_device_large(
        small_model, tr_x, tr_y, (te_x, te_y),
        residual_sample_seed=miss_seed, **kw)
    assert info_miss["rel_residual_estimated"] is True        # unsampled
    assert info_miss["rel_residual_maxrow_ratio"] < 50.0


def test_residual_max_row_gate_validation():
    with pytest.raises(ValueError, match="residual_max_row_gate"):
        classify_device_large(None, np.zeros((4, 1, 7, 7)), np.zeros(4),
                              residual_max_row_gate=1.0)
