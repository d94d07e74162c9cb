"""Device-resident pipeline tests: on-device assembly matches the
streaming engine; end-to-end classification without host round trips."""

import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.parallel import classify_device, gram_device, gram_in_memory


@pytest.fixture(scope="module")
def model():
    return G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(3, stride=2),
                        G.ReLU(), G.Conv2d(7, padding=0))


def test_gram_device_matches_streaming(model):
    x, _, _, _ = synthetic_arrays(n_train=37, n_test=0, shape=(1, 14, 14))
    want = gram_in_memory(model, x, batch_size=10, progress=False)
    got = np.asarray(gram_device(model, x, batch_size=10))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(got, got.T)


def test_gram_device_cross(model):
    x, _, _, _ = synthetic_arrays(n_train=23, n_test=0, shape=(1, 14, 14))
    z, _, _, _ = synthetic_arrays(n_train=31, n_test=0, shape=(1, 14, 14),
                                  seed=5)
    want = gram_in_memory(model, x, z, batch_size=10, progress=False)
    got = np.asarray(gram_device(model, x, z, batch_size=10))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_gram_device_diag_consistency(model):
    """Diagonal of the device Gram must equal xx/2-fixed entries (the
    mask-driven fix must run inside the fused assembly too)."""
    x, _, _, _ = synthetic_arrays(n_train=16, n_test=0, shape=(1, 14, 14))
    k = np.asarray(gram_device(model, x, batch_size=8))
    kd = np.asarray(model(x, diag=True))
    np.testing.assert_allclose(np.diagonal(k), kd, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("refine", [False, True])
def test_classify_device_end_to_end(refine):
    model = G.Sequential(
        G.Conv2d(7, var_weight=2.79 * 49, var_bias=7.86), G.ReLU(),
        G.Conv2d(14, padding=0, var_weight=2.79, var_bias=7.86))
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=96, n_test=32, shape=(1, 14, 14), seed=4)
    accs = classify_device(model, tr_x, tr_y, (te_x, te_y),
                           batch_size=32, jitter=1e-6, refine=refine)
    assert accs[0] > 0.9, accs


@pytest.mark.parametrize("refine", [False, True])
def test_classify_device_variances(refine):
    """Device variances == the float64 cho_factor oracle
    (ops.solve.predictive_variance) with the scale-normalised jitter
    convention (jitter_raw = jitter * mean(diag))."""
    from cnn_gp_tpu.ops.solve import predictive_variance
    model = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(7, padding=0))
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=60, n_test=20, shape=(1, 7, 7), seed=8)
    jitter = 1e-4
    accs, var = classify_device(model, tr_x, tr_y, (te_x, te_y),
                                batch_size=16, jitter=jitter,
                                refine=refine, variances=True)
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=16,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(model, te_x, tr_x, batch_size=16,
                                    progress=False), np.float64)
    kzz = np.asarray(model(te_x, diag=True), np.float64)
    jr = jitter * float(np.mean(np.diagonal(kxx)))
    want = predictive_variance(kxx, kzx, kzz, jitter=jr)
    assert var[0].shape == (20,) and (var[0] >= 0).all()
    scale = float(kzz.mean())
    np.testing.assert_allclose(var[0], want, atol=5e-6 * scale, rtol=2e-4)
