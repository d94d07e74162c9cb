"""NNGP kernel combinator DSL.

TPU-native rebuild of the reference's kernel layer zoo (reference:
cnn_gp/kernels.py:13-296) with the same user-facing API:

    model = Sequential(Conv2d(7), ReLU(), ..., Conv2d(28, padding=0))
    K = model(x, y)          # one Gram block, [N1, N2]
    K = model(x)             # symmetric block (same=True)
    k = model(x, diag=True)  # diagonal only, [N]
    net = model.nn(channels, in_channels=C, out_channels=O)  # finite mirror

Design differences from the reference (all deliberate, all TPU-first):

* Layers are immutable pytree nodes, not ``nn.Module``s.  ``propagate`` is a
  pure function ``KernelPatch -> KernelPatch``; the whole combinator tree is
  traced once per (shape, flags) combination and compiled by XLA.  The model
  itself is a valid ``jax.jit`` argument, so ``Mixture``'s logit is an
  ordinary differentiable leaf.
* ``Conv2d`` lowers to a scaled box filter (ops/boxfilter.py) -- no constant
  weight tensor, native asymmetric padding instead of the even-kernel
  zero-row trick (reference: cnn_gp/kernels.py:73-88).
* ``ReLU`` lowers to a fused elementwise arccos transform (ops/arccos.py),
  as a Pallas TPU kernel on TPU.
* The diagonal fix-up is mask-driven (see ``KernelPatch.diag_mask``), so
  Gram-tile sweeps compile one program for diagonal and off-diagonal tiles.
* ``model.nn()`` returns a pure-JAX ``FiniteNet`` (init/apply) instead of a
  torch module; see finite.py.
"""

from __future__ import annotations

import functools
import operator
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from . import settings
from .kernel_patch import KernelPatch
from .ops import arccos, boxfilter

__all__ = ["NNGPKernel", "Conv2d", "ReLU", "Sequential", "Sum", "Mixture",
           "resnet_block", "kernel_fn", "input_patch", "apply_kernel"]

_PRECISIONS = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}


def _register(cls, children: Sequence[str] = (), static: Sequence[str] = ()):
    """Register a layer class as a pytree node."""
    children = tuple(children)
    static = tuple(static)

    def flatten(obj):
        return (tuple(getattr(obj, n) for n in children),
                tuple(getattr(obj, n) for n in static))

    def unflatten(st, ch):
        obj = object.__new__(cls)
        for n, v in zip(children, ch):
            object.__setattr__(obj, n, v)
        for n, v in zip(static, st):
            object.__setattr__(obj, n, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


# ---------------------------------------------------------------------------
# Forward entry point
# ---------------------------------------------------------------------------

def input_patch(x, y, same: bool, diag: bool,
                diag_mask: Optional[jax.Array] = None,
                precision=lax.Precision.HIGHEST) -> KernelPatch:
    """Channel-mean second moments of the inputs (reference:
    cnn_gp/kernels.py:43-49).

    ``xy[i, j] = mean_c(x[i, c] * y[j, c])`` is a batched matmul over the
    channel axis per pixel -- an MXU contraction -- rather than the
    reference's broadcast-multiply-then-mean.
    """
    c = x.shape[1]
    if diag:
        xy = jnp.mean(x * y, axis=1)
    else:
        xy = jnp.einsum("icwh,jcwh->ijwh", x, y, precision=precision) / c
    xx = jnp.mean(x * x, axis=1)
    yy = jnp.mean(y * y, axis=1)
    return KernelPatch(xy, xx, yy, same, diag, diag_mask)


def _finalize(kp: KernelPatch, n1: int, n2: int, diag: bool) -> jax.Array:
    w, h = kp.spatial
    if (w, h) != (1, 1):
        raise ValueError(
            f"model must reduce spatial dims to 1x1 before readout, got "
            f"{(w, h)}; add a valid-padding Conv2d covering the whole map "
            f"(reference: cnn_gp/kernels.py:53-57)")
    if diag:
        return kp.xy.reshape(n1)
    return kp.xy.reshape(n1, n2)


def apply_kernel(model, x, y, same, diag, diag_mask=None):
    """Un-jitted kernel core: trace-time building block for jitted entry
    points (kernel_fn, Gram tile sweeps, shard_map bodies)."""
    prec = _PRECISIONS[settings.moment_precision]
    kp = input_patch(x, y, same, diag, diag_mask, precision=prec)
    kp = model.propagate(kp)
    return _finalize(kp, x.shape[0], y.shape[0], diag)


@functools.partial(
    jax.jit,
    static_argnames=("same", "diag", "has_mask", "snap"))
def _kernel_jit(model, x, y, diag_mask, same, diag, has_mask, snap):
    del snap  # only a cache key; settings are read at trace time
    return apply_kernel(model, x, y, same, diag,
                        diag_mask if has_mask else None)


def kernel_fn(model, x, y=None, same=None, diag=False,
              diag_mask: Optional[jax.Array] = None) -> jax.Array:
    """Compute one Gram block; mirrors ``NNGPKernel.forward`` (reference:
    cnn_gp/kernels.py:18-57).

    ``diag_mask`` additionally marks same-example (row, col) pairs for
    off-diagonal tiles of a symmetric Gram matrix; see kernel_patch.py.
    """
    if y is None:
        assert same is None, "y=None implies same=True"
        y, same = x, True
    elif same is None:
        same = False
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    assert x.ndim == 4 and y.ndim == 4, "inputs must be [N, C, W, H]"
    assert x.shape[1:] == y.shape[1:], "channel/spatial dims must match"
    if diag:
        assert x.shape[0] == y.shape[0], (
            "diagonal kernels must operate with data of equal length")
    return _kernel_jit(model, x, y,
                       diag_mask if diag_mask is not None else jnp.zeros((0,)),
                       same, diag, diag_mask is not None,
                       settings.snapshot())


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class NNGPKernel:
    """Base class: transforms one kernel patch into another."""

    def __call__(self, x, y=None, same=None, diag=False, diag_mask=None):
        return kernel_fn(self, x, y, same, diag, diag_mask)

    def propagate(self, kp: KernelPatch) -> KernelPatch:
        raise NotImplementedError

    def layers(self) -> int:
        """Number of conv layers (reference: cnn_gp/kernels.py:124-125)."""
        raise NotImplementedError

    def nn(self, channels, in_channels=None, out_channels=None):
        """Finite-width random network with this kernel as its
        infinite-width limit (reference: cnn_gp/kernels.py:100-122)."""
        from . import finite
        return finite.FiniteNet(self, channels, in_channels, out_channels)


class Conv2d(NNGPKernel):
    """Covariance map of an infinite-channel conv layer.

    Cross-correlates each covariance map with a constant
    ``var_weight / k^2`` kernel and adds ``var_bias`` (reference:
    cnn_gp/kernels.py:60-98).  Lowered as a scaled box filter.

    ``learnable=True`` registers ``var_weight``/``var_bias`` as pytree
    LEAVES (JAX scalars) instead of static aux data, making them
    differentiable hyperparameters for type-II ML (``cnn_gp_tpu.fit``) —
    the values the paper fixed by random search
    (reference: cnn_gp/kernels.py:61-76).  Opt-in: static hyperparameters
    keep one compiled program per architecture, while leaves make them
    jit *arguments* (no retrace when only their values change, but a
    different trace cache key shape).
    """

    def __init__(self, kernel_size, stride=1, padding="same", dilation=1,
                 var_weight=1.0, var_bias=0.0, in_channel_multiplier=1,
                 out_channel_multiplier=1, learnable=False):
        self.kernel_size = int(kernel_size)
        self.stride = int(stride)
        self.dilation = int(dilation)
        self.learnable = bool(learnable)
        if self.learnable:
            self.var_weight = jnp.asarray(var_weight, jnp.float32)
            self.var_bias = jnp.asarray(var_bias, jnp.float32)
        else:
            self.var_weight = float(var_weight)
            self.var_bias = float(var_bias)
        self.in_channel_multiplier = int(in_channel_multiplier)
        self.out_channel_multiplier = int(out_channel_multiplier)
        # The reference's even-kernel "same" trick (zero first row/col of a
        # (k+1)-kernel, cnn_gp/kernels.py:73-88) becomes native asymmetric
        # padding; `even_trick` is kept so nn() mirrors the finite-width
        # weight distribution exactly.
        self.even_trick = (padding == "same" and kernel_size % 2 == 0)
        if padding == "same":
            # the symmetric component; pad_lo_hi re-derives the even-k
            # asymmetric pair from the same boxfilter helper
            self.padding = boxfilter.same_padding(self.kernel_size,
                                                  self.dilation)[1]
        else:
            try:
                self.padding = operator.index(padding)
            except TypeError:
                raise TypeError(
                    f"Conv2d padding must be 'same' or an int, got "
                    f"{padding!r}: the finite-width mirror (nn()) and "
                    f"the reference semantics have no general (lo, hi) "
                    f"counterpart — call ops.boxfilter.box_filter_2d "
                    f"directly for asymmetric padding") from None

    @property
    def pad_lo_hi(self):
        if self.even_trick:
            return boxfilter.same_padding(self.kernel_size, self.dilation)
        return (self.padding, self.padding)

    def propagate(self, kp: KernelPatch) -> KernelPatch:
        k = self.kernel_size
        scale = self.var_weight / (k * k)

        def f(a):
            out = boxfilter.box_filter_2d(
                a, k, self.stride, self.pad_lo_hi, self.dilation,
                method=settings.conv_method)
            return out * scale + self.var_bias

        return KernelPatch(f(kp.xy), f(kp.xx), f(kp.yy), kp.same, kp.diag,
                           kp.diag_mask)

    def layers(self):
        return 1


_CONV_STATIC = ("kernel_size", "stride", "dilation",
                "in_channel_multiplier", "out_channel_multiplier",
                "even_trick", "padding", "learnable")


def _conv_flatten(obj):
    """var_weight/var_bias are children iff ``learnable`` (see Conv2d)."""
    static = tuple(getattr(obj, n) for n in _CONV_STATIC)
    if obj.learnable:
        return (obj.var_weight, obj.var_bias), static
    return (), static + (obj.var_weight, obj.var_bias)


def _conv_unflatten(static, children):
    obj = object.__new__(Conv2d)
    for n, v in zip(_CONV_STATIC, static):
        object.__setattr__(obj, n, v)
    vw, vb = children if obj.learnable else static[len(_CONV_STATIC):]
    object.__setattr__(obj, "var_weight", vw)
    object.__setattr__(obj, "var_bias", vb)
    return obj


def _conv_flatten_with_keys(obj):
    """Same flattening, with named keys so ``fit`` can recognise the
    positive-only variance leaves by path and optimise them in log
    space."""
    children, static = _conv_flatten(obj)
    keys = (jax.tree_util.GetAttrKey("var_weight"),
            jax.tree_util.GetAttrKey("var_bias"))[:len(children)]
    return tuple(zip(keys, children)), static


jax.tree_util.register_pytree_with_keys(
    Conv2d, _conv_flatten_with_keys, _conv_unflatten, _conv_flatten)


class ReLU(NNGPKernel):
    """Arccos-kernel ReLU nonlinearity (reference: cnn_gp/kernels.py:128-165)."""

    def propagate(self, kp: KernelPatch) -> KernelPatch:
        return arccos.relu_transform(kp, method=settings.relu_method)

    def layers(self):
        return 0


_register(ReLU)


class Sequential(NNGPKernel):
    def __init__(self, *mods):
        self.mods = tuple(mods)

    def propagate(self, kp: KernelPatch) -> KernelPatch:
        for mod in self.mods:
            kp = mod.propagate(kp)
        return kp

    def layers(self):
        return sum(mod.layers() for mod in self.mods)


_register(Sequential, children=("mods",))


class Sum(NNGPKernel):
    """Kernel of a sum of independent branches = sum of branch kernels
    (reference: cnn_gp/kernels.py:246-260).  With an empty ``Sequential()``
    branch this expresses residual connections."""

    def __init__(self, mods):
        self.mods = tuple(mods)

    def propagate(self, kp: KernelPatch) -> KernelPatch:
        total = self.mods[0].propagate(kp)
        for mod in self.mods[1:]:
            total = total + mod.propagate(kp)
        return total

    def layers(self):
        return max(mod.layers() for mod in self.mods)


_register(Sum, children=("mods",))


class Mixture(NNGPKernel):
    """Softmax-weighted convex mixture of branch kernels (reference:
    cnn_gp/kernels.py:203-229).  ``logit`` is the library's only trainable
    parameter; here it is an ordinary pytree leaf, so the whole model is
    differentiable with ``jax.grad`` out of the box."""

    def __init__(self, mods, logit_proportions=None):
        self.mods = tuple(mods)
        if logit_proportions is None:
            logit_proportions = jnp.zeros(len(self.mods))
        self.logit = jnp.asarray(logit_proportions)

    def propagate(self, kp: KernelPatch) -> KernelPatch:
        proportions = jax.nn.softmax(self.logit)
        total = self.mods[0].propagate(kp) * proportions[0]
        for i, mod in enumerate(self.mods[1:], start=1):
            total = total + mod.propagate(kp) * proportions[i]
        return total

    def layers(self):
        return max(mod.layers() for mod in self.mods)


_register(Mixture, children=("mods", "logit"))


def resnet_block(stride=1, projection_shortcut=False, multiplier=1):
    """Pre-activation ResNet block in the kernel DSL (reference:
    cnn_gp/kernels.py:274-296)."""
    if stride == 1 and not projection_shortcut:
        return Sum([
            Sequential(),
            Sequential(
                ReLU(),
                Conv2d(3, stride=stride, in_channel_multiplier=multiplier,
                       out_channel_multiplier=multiplier),
                ReLU(),
                Conv2d(3, in_channel_multiplier=multiplier,
                       out_channel_multiplier=multiplier),
            ),
        ])
    return Sequential(
        ReLU(),
        Sum([
            Conv2d(1, stride=stride,
                   in_channel_multiplier=multiplier // stride,
                   out_channel_multiplier=multiplier),
            Sequential(
                Conv2d(3, stride=stride,
                       in_channel_multiplier=multiplier // stride,
                       out_channel_multiplier=multiplier),
                ReLU(),
                Conv2d(3, in_channel_multiplier=multiplier,
                       out_channel_multiplier=multiplier),
            ),
        ]),
    )
