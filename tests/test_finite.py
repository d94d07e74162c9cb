"""Finite-NN mirror tests: exact apply parity with the torch reference
(same weights => same outputs) and MC convergence to the analytic kernel."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cnn_gp_tpu as G
from cnn_gp_tpu.finite import FiniteNet, sample_nn_outputs


def test_conv_weight_distribution():
    layer = G.Conv2d(5, var_weight=3.0, var_bias=2.0)
    net = FiniteNet(layer, channels=64, in_channels=32, out_channels=16)
    params = net.init(jax.random.key(0))
    w = np.asarray(params["w"])
    assert w.shape == (16, 32, 5, 5)
    # std = sqrt(var_weight / in_total) / kernel_size
    # (reference: cnn_gp/kernels.py:115-116)
    want_std = math.sqrt(3.0 / 32) / 5
    assert abs(w.std() / want_std - 1) < 0.05
    b = np.asarray(params["b"])
    assert abs(b.std() / math.sqrt(2.0) - 1) < 0.5  # only 16 samples


def test_even_trick_zero_row_col():
    layer = G.Conv2d(4)  # same padding, even => enlarged kernel
    net = FiniteNet(layer, channels=8, in_channels=4, out_channels=4)
    w = np.asarray(net.init(jax.random.key(1))["w"])
    assert w.shape[-2:] == (5, 5)
    assert (w[:, :, 0, :] == 0).all() and (w[:, :, :, 0] == 0).all()


def test_channel_multipliers():
    layer = G.Conv2d(3, in_channel_multiplier=2, out_channel_multiplier=4)
    net = FiniteNet(layer, channels=8)
    w = np.asarray(net.init(jax.random.key(0))["w"])
    assert w.shape[:2] == (32, 16)


def test_sequential_channel_threading():
    m = G.Sequential(G.Conv2d(3), G.ReLU(), G.Conv2d(3), G.ReLU(),
                     G.Conv2d(8, padding=0))
    net = FiniteNet(m, channels=16, in_channels=3, out_channels=1)
    params = net.init(jax.random.key(0))
    x = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
    y = np.asarray(net.apply(params, x))
    assert y.shape == (2, 1, 1, 1)
    assert params[0]["w"].shape[:2] == (16, 3)
    assert params[4]["w"].shape[:2] == (1, 16)


def test_apply_parity_with_torch(ref_kernels, rng):
    """Same weights loaded into torch and JAX => identical outputs."""
    import torch
    R = ref_kernels
    ref_m = R.Sequential(R.Conv2d(4, var_bias=0.5), R.ReLU(),
                         R.Conv2d(3, stride=2), R.ReLU(),
                         R.Conv2d(4, padding=0))
    our_m = G.Sequential(G.Conv2d(4, var_bias=0.5), G.ReLU(),
                         G.Conv2d(3, stride=2), G.ReLU(),
                         G.Conv2d(4, padding=0))
    torch.manual_seed(0)
    ref_nn = ref_m.nn(6, in_channels=3, out_channels=2)
    net = FiniteNet(our_m, channels=6, in_channels=3, out_channels=2)
    params = net.init(jax.random.key(0))

    # copy torch weights (OIHW, same layout) into our params
    tmods = [m for m in ref_nn.modules()
             if isinstance(m, torch.nn.Conv2d)]
    new_params = list(params)
    conv_slots = [i for i, p in enumerate(params) if p != ()]
    assert len(conv_slots) == len(tmods)
    for slot, tm in zip(conv_slots, tmods):
        p = dict(params[slot])
        p["w"] = jnp.asarray(tm.weight.detach().numpy())
        if "b" in p:
            p["b"] = jnp.asarray(tm.bias.detach().numpy())
        new_params[slot] = p
    x = rng.randn(3, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref_nn(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(tuple(new_params), x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mc_convergence_to_kernel():
    """Wide finite nets' empirical covariance must approach the analytic
    kernel (the reference's core validation experiment,
    exp_random_nn/random_comparison.py)."""
    model = G.Sequential(G.Conv2d(3, var_weight=2.0), G.ReLU(),
                         G.Conv2d(8, padding=0, var_weight=1.5,
                                  var_bias=0.1))
    rng = np.random.RandomState(0)
    x = rng.randn(6, 2, 8, 8).astype(np.float32)
    true_cov = np.asarray(model(x))
    r = np.asarray(sample_nn_outputs(
        model, x, jax.random.key(0), n_samples=4000, channels=96,
        in_channels=2, sample_batch=200))
    est_cov = r.T @ r / len(r)
    scale = np.abs(true_cov).max()
    assert np.abs(est_cov - true_cov).max() / scale < 0.12, (
        np.abs(est_cov - true_cov).max() / scale)


def test_sum_module_residual():
    m = G.Sum([G.Sequential(), G.Sequential(G.Conv2d(3), G.ReLU())])
    net = FiniteNet(m, channels=4)
    params = net.init(jax.random.key(0))
    x = np.random.RandomState(0).randn(2, 4, 6, 6).astype(np.float32)
    got = np.asarray(net.apply(params, x))
    branch = np.asarray(
        jnp.maximum(FiniteNet(G.Conv2d(3), 4).apply(params[1][0], x), 0.0))
    np.testing.assert_allclose(got, x + branch, rtol=1e-5, atol=1e-6)


def test_resnet32_finite_mirror_shapes():
    """model.nn() must thread channel multipliers through all 15
    projection/identity resnet blocks (reference: cnn_gp/kernels.py:274-296
    + configs/mnist_as_tf.py)."""
    import configs
    model = configs.load("mnist_as_tf").initial_model
    net = FiniteNet(model, channels=4, in_channels=1, out_channels=10)
    x = np.random.RandomState(0).rand(2, 1, 28, 28).astype(np.float32)
    y = np.asarray(net.apply(net.init(jax.random.key(0)), x))
    assert y.shape == (2, 10, 1, 1)
    assert np.isfinite(y).all()


@pytest.mark.slow
def test_residual_paper_bug_reproduced():
    """The residual-cnn config sums branches after the ReLU -- dependent,
    non-zero-mean branches -- so its finite nets do NOT converge to the
    analytic kernel; the reference replicates this deliberately and so do
    we (reference: configs/mnist_paper_residual_cnn_gp.py:1-14).  The
    empirical covariance must stay far from the kernel even at width 128
    (measured plateau ~0.15), while a proper post-conv resnet_block
    converges to the Monte-Carlo floor."""
    rng = np.random.RandomState(0)
    x = rng.rand(10, 1, 8, 8).astype(np.float32)

    def covdev(model, width, n=2000):
        r = np.asarray(sample_nn_outputs(
            model, x, jax.random.key(0), n_samples=n, channels=width,
            in_channels=1, sample_batch=100))
        est = r.T @ r / len(r)
        true = np.asarray(model(x))
        return np.abs(est - true).mean() / np.abs(true).mean()

    buggy = G.Sequential(
        G.Sum([G.Sequential(),
               G.Sequential(G.Conv2d(4, var_weight=7.27 * 16,
                                     var_bias=4.69), G.ReLU())]),
        G.Conv2d(8, padding=0, var_weight=7.27, var_bias=4.69))
    proper = G.Sequential(G.Conv2d(3), G.resnet_block(), G.ReLU(),
                          G.Conv2d(8, padding=0))
    assert covdev(buggy, 128) > 0.08      # systematic bias, not MC noise
    assert covdev(proper, 128) < 0.05     # converges to the kernel
