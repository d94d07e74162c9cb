"""Strided/dilated box filters: the NNGP Conv2d covariance op.

The reference implements the conv-layer covariance map as a cuDNN
cross-correlation with a *constant* all-ones kernel scaled by
``var_weight / k**2`` (reference: cnn_gp/kernels.py:78-98).  A conv with a
constant kernel is just a scaled windowed sum (box filter), so on TPU we
never materialise a weight tensor at all.  Three interchangeable lowerings:

* ``separable``  -- two 1-D ``lax.reduce_window`` sums (rows then columns):
  ``2k`` adds per output instead of ``k**2``.  Exact for box filters because
  the window sum factorises and zero padding commutes with it.  Default.
* ``direct``     -- one 2-D ``lax.reduce_window``.
* ``shifts``     -- the separable sum written as ``k`` explicit strided
  slices added together per axis: the same ``2k`` adds, but as ordinary
  elementwise HLO that XLA can fuse INTO the surrounding arccos/scale
  chain (``reduce_window`` compiles to its own loop nest and acts as a
  fusion boundary).  Measured on the v5e: see BASELINE.md round-3 conv
  lowering sweep.
* ``matmul``     -- banded 0/1 matrices contracted on the MXU
  (``einsum('Ww,...wh,hH->...WH')`` at HIGHEST precision).  Useful when the
  batch of maps is huge and the VPU is the bottleneck.

"Same" padding with an even kernel: the reference emulates the required
asymmetric padding by enlarging the kernel to ``(k+1)`` and zeroing its
first row/column (cnn_gp/kernels.py:73-88).  XLA supports asymmetric
``(lo, hi)`` padding natively, so we lower it directly:
``lo = p - dilation, hi = p`` with ``p = dilation * (k // 2)``, which is
numerically identical (the zeroed taps contribute nothing).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["same_padding", "resolve_padding", "box_filter_2d", "out_size",
           "DEFAULT_METHOD"]

DEFAULT_METHOD = "separable"

PadT = Tuple[int, int]


def same_padding(kernel_size: int, dilation: int = 1) -> PadT:
    """(lo, hi) padding replicating the reference's "same" mode.

    Odd kernels: symmetric ``p = dilation * (k // 2)``.  Even kernels: the
    reference's zero-row trick is equivalent to ``(p - dilation, p)``.
    """
    p = dilation * (kernel_size // 2)
    if kernel_size % 2 == 0:
        return (p - dilation, p)
    return (p, p)


def resolve_padding(padding: Union[str, int, PadT], kernel_size: int,
                    dilation: int = 1) -> PadT:
    if isinstance(padding, str):
        if padding != "same":
            raise ValueError(f"unknown padding {padding!r}")
        return same_padding(kernel_size, dilation)
    if isinstance(padding, int):
        return (padding, padding)
    lo, hi = padding
    return (int(lo), int(hi))


def out_size(length: int, kernel_size: int, stride: int, pad: PadT,
             dilation: int) -> int:
    eff = dilation * (kernel_size - 1) + 1
    return (length + pad[0] + pad[1] - eff) // stride + 1


def _reduce_window_1d(x: jax.Array, axis: int, k: int, stride: int,
                      pad: PadT, dilation: int) -> jax.Array:
    nd = x.ndim
    window = [1] * nd
    strides = [1] * nd
    padding = [(0, 0)] * nd
    wdil = [1] * nd
    window[axis] = k
    strides[axis] = stride
    padding[axis] = tuple(pad)
    wdil[axis] = dilation
    return lax.reduce_window(x, 0.0, lax.add, window, strides, padding,
                             window_dilation=wdil)


def _shift_sum_1d(x: jax.Array, axis: int, k: int, stride: int,
                  pad: PadT, dilation: int) -> jax.Array:
    """Windowed sum along ``axis`` as ``k`` strided slices added together:
    ``out[o] = sum_a xp[o*stride + a*dilation]`` over the zero-padded
    input — plain elementwise adds instead of a ``reduce_window`` loop."""
    n = x.shape[axis]
    n_out = out_size(n, k, stride, pad, dilation)
    if pad[0] or pad[1]:
        cfg = [(0, 0, 0)] * x.ndim
        cfg[axis] = (pad[0], pad[1], 0)
        x = lax.pad(x, jnp.asarray(0.0, x.dtype), cfg)
    total = None
    for a in range(k):
        start = a * dilation
        sl = lax.slice_in_dim(x, start, start + (n_out - 1) * stride + 1,
                              stride, axis)
        total = sl if total is None else total + sl
    return total


def _band_matrix(length: int, k: int, stride: int, pad: PadT,
                 dilation: int, dtype) -> np.ndarray:
    """[out, length] 0/1 matrix: out[o] = sum_a x[o*stride - lo + a*dilation]."""
    n_out = out_size(length, k, stride, pad, dilation)
    m = np.zeros((n_out, length), dtype=dtype)
    for o in range(n_out):
        for a in range(k):
            idx = o * stride - pad[0] + a * dilation
            if 0 <= idx < length:
                m[o, idx] = 1.0
    return m


def box_filter_2d(x: jax.Array, kernel_size: int, stride: int = 1,
                  padding: Union[str, int, PadT] = 0, dilation: int = 1,
                  method: str = DEFAULT_METHOD) -> jax.Array:
    """Windowed sum over the trailing two dims of ``x`` ([..., W, H])."""
    pad = resolve_padding(padding, kernel_size, dilation)
    if method == "shifts":
        y = _shift_sum_1d(x, x.ndim - 2, kernel_size, stride, pad, dilation)
        return _shift_sum_1d(y, x.ndim - 1, kernel_size, stride, pad,
                             dilation)
    if method == "separable":
        y = _reduce_window_1d(x, x.ndim - 2, kernel_size, stride, pad,
                              dilation)
        return _reduce_window_1d(y, x.ndim - 1, kernel_size, stride, pad,
                                 dilation)
    if method == "direct":
        nd = x.ndim
        window = [1] * nd
        strides = [1] * nd
        padding_ = [(0, 0)] * nd
        wdil = [1] * nd
        for axis in (nd - 2, nd - 1):
            window[axis] = kernel_size
            strides[axis] = stride
            padding_[axis] = tuple(pad)
            wdil[axis] = dilation
        return lax.reduce_window(x, 0.0, lax.add, window, strides, padding_,
                                 window_dilation=wdil)
    if method == "matmul":
        w_in, h_in = x.shape[-2:]
        rw = jnp.asarray(_band_matrix(w_in, kernel_size, stride, pad,
                                      dilation, x.dtype))
        rh = jnp.asarray(_band_matrix(h_in, kernel_size, stride, pad,
                                      dilation, x.dtype))
        return jnp.einsum("Ww,...wh,hH->...WH", rw, x, rh.T,
                          precision=lax.Precision.HIGHEST)
    raise ValueError(f"unknown box filter method {method!r}")
