"""Whole-network fused Pallas Gram-tile kernel ("megakernel").

The XLA lowering computes a Gram tile as 2L+1 fused elementwise/window
stages with the [b^2, W, H] pair tensor round-tripping HBM between convs
(each `reduce_window` is a fusion barrier).  This kernel instead runs the
ENTIRE ConvNet-GP-family network — L x (k x k "same" box conv + arccos
ReLU) + full-image readout conv (reference: configs/
mnist_paper_convnet_gp.py:19-30, cnn_gp/kernels.py:92-98,146-162) — for a
block of tile rows in one `pallas_call`, keeping every intermediate in
VMEM:

* layout `[H, W, rows_per_step, 128 cols]`: spatial axes are untiled
  leading dims, so the k-tap box filters are zero-pad + k static slices
  (pure VPU adds); the pair axes land on the (sublane, lane) tile exactly
  at (8, 128) — no physical padding waste;
* the row/column variance recursions (xx/yy) evolve inline in the same
  loop, so the ReLU transform and its same-example diag fix (driven by the
  global-index mask, not an eye matrix) never leave VMEM;
* HBM traffic per grid step is one image-row block + the replicated
  column images (re-fetch elided by Pallas' revisiting rule) + a [r, 128]
  output block — O(b * S) instead of O(L * b^2 * S).

Supported architecture pattern (`match()`): `Sequential` of L x
[`Conv2d(k odd, "same", stride 1, dilation 1)`, `ReLU`] closed by a
padding-0 readout `Conv2d` covering the full map.  This is the paper
ConvNet GP family; residual/strided nets fall back to the XLA path.

Measured verdict on the v5e (BASELINE.md "Megakernel verdict"): the XLA
path WINS — 1.69-1.76 ms/tile vs this kernel's best 2.09 ms (rows=16;
0.84x).  XLA's fused elementwise+reduce_window chains already keep the
working set on-chip, and Mosaic's generic lowering of the slice-sum box
filters costs more VPU work than XLA's native reduce_window.  The kernel
is kept as the measured answer to round-1 VERDICT #5 (and as the starting
point should shapes change, e.g. much larger images); the production path
stays XLA.
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .arccos import F32_TINY, acos_f32

__all__ = ["match", "gram_tile", "MegaSpec"]


class MegaSpec(NamedTuple):
    kernel_size: int
    layer_vw_vb: Tuple[Tuple[float, float], ...]   # L x (var_weight, var_bias)
    readout_k: int
    readout_vw: float
    readout_vb: float


def match(model) -> Optional[MegaSpec]:
    """Return a MegaSpec if `model` is in the fusable ConvNet-GP family."""
    from ..kernels import Conv2d, ReLU, Sequential
    if not isinstance(model, Sequential):
        return None
    mods = list(model.mods)
    if len(mods) < 3 or len(mods) % 2 == 0:
        return None
    readout = mods[-1]
    if not (isinstance(readout, Conv2d) and readout.padding == 0
            and not readout.even_trick and readout.stride == 1
            and readout.dilation == 1):
        return None
    layers: List[Tuple[float, float]] = []
    k = None
    for conv, relu in zip(mods[0:-1:2], mods[1:-1:2]):
        if not (isinstance(conv, Conv2d) and isinstance(relu, ReLU)):
            return None
        if not (conv.stride == 1 and conv.dilation == 1
                and conv.kernel_size % 2 == 1
                and conv.padding == conv.kernel_size // 2
                and not conv.even_trick):
            return None
        if k is None:
            k = conv.kernel_size
        elif conv.kernel_size != k:
            return None
        layers.append((conv.var_weight, conv.var_bias))
    return MegaSpec(k, tuple(layers), readout.kernel_size,
                    readout.var_weight, readout.var_bias)


def _box1d(x: jax.Array, axis: int, k: int) -> jax.Array:
    """Same-size k-tap box sum along a leading (untiled) axis: zero pad +
    k static slices.  k odd, stride 1."""
    p = k // 2
    shape = list(x.shape)
    shape[axis] = p
    zeros = jnp.zeros(shape, x.dtype)
    xp = jnp.concatenate([zeros, x, zeros], axis=axis)
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    acc = None
    for s in range(k):
        idx[axis] = slice(s, s + n)
        piece = xp[tuple(idx)]
        acc = piece if acc is None else acc + piece
    return acc


def _box2d(x, k):
    return _box1d(_box1d(x, 0, k), 1, k)


def _kernel(spec: MegaSpec, c: int, r: int, x_ref, z_ref, mask_ref,
            out_ref):
    # x_ref: [C, H, W, r, 1] rows of this step; z_ref: [C, H, W, 1, 128];
    # mask_ref: [r, 128]; out_ref: [r, 128]
    k = spec.kernel_size
    # input second moments, channel-mean (reference: cnn_gp/kernels.py:44-49)
    xy = xx = yy = None
    for ci in range(c):
        xc = x_ref[ci]                       # [H, W, r, 1]
        zc = z_ref[ci]                       # [H, W, 1, 128]
        xy = (xc * zc) if xy is None else xy + xc * zc
        xx = (xc * xc) if xx is None else xx + xc * xc
        yy = (zc * zc) if yy is None else yy + zc * zc
    inv_c = 1.0 / c
    xy, xx, yy = xy * inv_c, xx * inv_c, yy * inv_c
    mask = mask_ref[:].reshape(1, 1, r, 128) > 0.5

    for vw, vb in spec.layer_vw_vb:
        scale = vw / (k * k)
        xy = _box2d(xy, k) * scale + vb      # conv covariance map
        xx = _box2d(xx, k) * scale + vb
        yy = _box2d(yy, k) * scale + vb
        # arccos ReLU transform (reference: cnn_gp/kernels.py:146-162)
        xx_yy = xx * yy + F32_TINY
        cos_t = jnp.clip(xy * jax.lax.rsqrt(xx_yy), -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(xx_yy - xy * xy, 0.0))
        theta = acos_f32(cos_t)
        new_xy = (sin_t + (math.pi - theta) * xy) * (0.5 / math.pi)
        xx = xx * 0.5
        yy = yy * 0.5
        # same-example entries must equal xx' exactly (kernels.py:160-162)
        xy = jnp.where(mask, jnp.broadcast_to(xx, new_xy.shape), new_xy)
    # readout: full-image conv, padding 0 -> one spatial position
    r_scale = spec.readout_vw / (spec.readout_k * spec.readout_k)
    out_ref[:] = (jnp.sum(xy, axis=(0, 1)).reshape(r, 128) * r_scale
                  + spec.readout_vb)


@functools.partial(jax.jit,
                   static_argnames=("spec", "rows_per_step", "interpret"))
def _gram_tile_jit(spec, x, z, maskf, rows_per_step, interpret):
    c, h, w, bx = x.shape
    bz = z.shape[3]
    r = rows_per_step
    grid = (bx // r,)
    kern = functools.partial(_kernel, spec, c, r)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bx, bz), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, h, w, r, 1), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h, w, 1, bz), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bz), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, bz), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # the fused L-layer chain keeps ~7 live [28,28,r,128] buffers;
        # the default 16M scoped-vmem limit is below the chip's physical
        # VMEM, so raise it for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x[:, :, :, :, None], z[:, :, :, None, :], maskf)
    return out


def gram_tile(spec: MegaSpec, x: jax.Array, z: jax.Array,
              mask: Optional[jax.Array] = None, rows_per_step: int = 16,
              interpret: bool = False) -> jax.Array:
    """One [bx, bz] Gram tile of the fused network.

    ``x``: [bx, C, H, W]; ``z``: [bz, C, H, W]; ``mask``: [bx, bz] bool of
    same-example pairs (the diag fix), or None.  bx must be divisible by
    ``rows_per_step`` and bz by 128 (the caller falls back to XLA
    otherwise).
    """
    bx, c, h, w = x.shape
    bz = z.shape[0]
    assert spec.readout_k == h == w, (spec.readout_k, h, w)
    assert bx % rows_per_step == 0 and bz % 128 == 0, (bx, bz)
    xt = jnp.transpose(jnp.asarray(x, jnp.float32), (1, 2, 3, 0))
    zt = jnp.transpose(jnp.asarray(z, jnp.float32), (1, 2, 3, 0))
    maskf = (jnp.zeros((bx, bz), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    return _gram_tile_jit(spec, xt, zt, maskf, rows_per_step, interpret)
