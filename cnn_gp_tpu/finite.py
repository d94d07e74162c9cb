"""Finite-width random networks mirroring the kernel DSL.

Rebuild of the reference's ``model.nn()`` path (reference:
cnn_gp/kernels.py:100-122, 167-170, 188-198, 255-258): every kernel layer
has a finite-width counterpart whose infinite-channel limit is that kernel.
Used by the Monte-Carlo validator (exp_random_nn) to check the analytic
kernels against sampled networks.

Instead of torch modules with in-place initialisers, a ``FiniteNet`` is a
pure (init, apply) pair:

    net = model.nn(channels=30, in_channels=3, out_channels=1)
    params = net.init(jax.random.key(0))
    y = net.apply(params, x)                      # [N, out, W', H']
    ys = sample_fn(model, ...)                     # vmapped MC draws

Weight distribution parity (exact by construction):
  * conv weights ~ N(0, sqrt(var_weight / in_channels_total) / kernel_size)
    (reference: cnn_gp/kernels.py:115-116),
  * for even "same" kernels the enlarged (k+1) kernel keeps its first
    row/column at zero (reference: cnn_gp/kernels.py:108-109, 117-119),
  * bias ~ N(0, sqrt(var_bias)) only when var_bias > 0
    (reference: cnn_gp/kernels.py:113, 120-121).

Deviation (documented): the reference's ``MixtureModule`` multiplies only
branch 0 by sqrt(softmax(logit)) -- the remaining factors are commented out
(reference: cnn_gp/kernels.py:240-242), so its finite net does *not*
converge to the Mixture kernel.  We scale every branch, which does.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import kernels as K

__all__ = ["FiniteNet", "sample_nn_outputs"]


def _build(layer, channels, in_ch, out_ch):
    """Recursively build (init, apply) for a kernel layer."""
    if isinstance(layer, K.Conv2d):
        return _build_conv(layer, channels, in_ch, out_ch)
    if isinstance(layer, K.ReLU):
        assert in_ch is None and out_ch is None, (
            "ReLU cannot change channel counts")
        return (lambda key: ()), (lambda p, x: jnp.maximum(x, 0.0))
    if isinstance(layer, K.Sequential):
        return _build_sequential(layer, channels, in_ch, out_ch)
    if isinstance(layer, (K.Sum, K.Mixture)):
        return _build_branches(layer, channels, in_ch, out_ch)
    raise TypeError(f"no finite-width mirror for {type(layer).__name__}")


def _build_conv(layer: "K.Conv2d", channels, in_ch, out_ch):
    in_total = (channels if in_ch is None else in_ch) \
        * layer.in_channel_multiplier
    out_total = (channels if out_ch is None else out_ch) \
        * layer.out_channel_multiplier
    ksz = layer.kernel_size + (1 if layer.even_trick else 0)
    std_w = math.sqrt(layer.var_weight / in_total) / layer.kernel_size
    has_bias = layer.var_bias > 0.0
    p = layer.padding

    def init(key):
        wkey, bkey = jax.random.split(key)
        w = std_w * jax.random.normal(
            wkey, (out_total, in_total, ksz, ksz), jnp.float32)
        if layer.even_trick:
            w = w.at[:, :, 0, :].set(0.0).at[:, :, :, 0].set(0.0)
        if has_bias:
            b = math.sqrt(layer.var_bias) * jax.random.normal(
                bkey, (out_total,), jnp.float32)
            return {"w": w, "b": b}
        return {"w": w}

    def apply(params, x):
        y = lax.conv_general_dilated(
            x, params["w"], (layer.stride, layer.stride), [(p, p), (p, p)],
            rhs_dilation=(layer.dilation, layer.dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)
        if has_bias:
            y = y + params["b"][None, :, None, None]
        return y

    return init, apply


def _build_sequential(layer: "K.Sequential", channels, in_ch, out_ch):
    mods = layer.mods
    if len(mods) == 0:
        return (lambda key: ()), (lambda p, x: x)
    if len(mods) == 1:
        return _build(mods[0], channels, in_ch, out_ch)
    # Thread in_channels into the first child and out_channels into the
    # last, plain `channels` through the middle (reference:
    # cnn_gp/kernels.py:188-198).
    pairs = ([_build(mods[0], channels, in_ch, None)]
             + [_build(m, channels, None, None) for m in mods[1:-1]]
             + [_build(mods[-1], channels, None, out_ch)])

    def init(key):
        keys = jax.random.split(key, len(pairs))
        return tuple(ini(k) for (ini, _), k in zip(pairs, keys))

    def apply(params, x):
        for (_, app), p in zip(pairs, params):
            x = app(p, x)
        return x

    return init, apply


def _build_branches(layer, channels, in_ch, out_ch):
    pairs = [_build(m, channels, in_ch, out_ch) for m in layer.mods]
    is_mixture = isinstance(layer, K.Mixture)

    def init(key):
        keys = jax.random.split(key, len(pairs))
        return tuple(ini(k) for (ini, _), k in zip(pairs, keys))

    def apply(params, x):
        outs = [app(p, x) for (_, app), p in zip(pairs, params)]
        if is_mixture:
            scale = jnp.sqrt(jax.nn.softmax(layer.logit))
            outs = [o * scale[i] for i, o in enumerate(outs)]
        total = outs[0]
        for o in outs[1:]:
            total = total + o
        return total

    return init, apply


class FiniteNet:
    """A random finite-width network sampled from a kernel model."""

    def __init__(self, model, channels: int,
                 in_channels: Optional[int] = None,
                 out_channels: Optional[int] = None):
        self.model = model
        self.channels = channels
        self.in_channels = in_channels
        self.out_channels = out_channels
        self._init, self._apply = _build(model, channels, in_channels,
                                         out_channels)

    def init(self, key):
        return self._init(key)

    def apply(self, params, x):
        return self._apply(params, jnp.asarray(x, jnp.float32))

    def __call__(self, key, x):
        return self.apply(self.init(key), x)


def _auto_sample_batch(n_images: int, channels: int, w: int, h: int) -> int:
    """Largest safe vmap batch for :func:`sample_nn_outputs` on one chip.

    The dominant live memory is the per-network activation stack
    ``[batch, n_images, channels, W, H]`` float32; XLA keeps ~4.5 such
    buffers live (padding included — calibrated against the measured
    width-100 CIFAR HBM report: 45.5 GB at batch 256, i.e. ~178 MB per
    sample = 4.3x the 41 MB unpadded activation).  Budget 12 GB of the
    v5e's 15.75 GB HBM and round down to a multiple of 8 sublanes.
    """
    per_sample = 4.5 * 4 * n_images * channels * w * h
    b = int(12e9 // per_sample)
    return max(8, min(256, (b // 8) * 8))


def sample_nn_outputs(model, x, key, n_samples: int, channels: int,
                      in_channels: int, out_channels: int = 1,
                      sample_batch: Optional[int] = None) -> jax.Array:
    """Monte-Carlo draws of finite-net outputs at pixel (0, 0).

    Vectorised replacement for the reference's 10k-iteration Python loop
    (reference: exp_random_nn/random_comparison.py:30-35): ``vmap`` over
    fresh parameter draws, scanned in chunks to bound memory.  Returns
    ``[n_samples, N]`` where ``N = len(x)``.  ``sample_batch=None`` sizes
    the chunk to fit one chip's HBM (see :func:`_auto_sample_batch` —
    width 100 on 3x32x32 inputs OOMs at the old fixed 256).
    """
    net = FiniteNet(model, channels, in_channels, out_channels)
    x = jnp.asarray(x, jnp.float32)
    if sample_batch is None:
        sample_batch = _auto_sample_batch(x.shape[0], channels,
                                          x.shape[2], x.shape[3])

    @jax.jit
    def one_batch(keys):
        def one(k):
            return net.apply(net.init(k), x)[:, 0, 0, 0]
        return jax.vmap(one)(keys)

    n_batches = -(-n_samples // sample_batch)
    keys = jax.random.split(key, n_batches * sample_batch)
    outs = [one_batch(keys[i * sample_batch:(i + 1) * sample_batch])
            for i in range(n_batches)]
    return jnp.concatenate(outs, axis=0)[:n_samples]
