"""Arccos-kernel ReLU covariance transform.

Implements the infinite-width ReLU covariance map (reference:
cnn_gp/kernels.py:128-165):

    xy' = ( sqrt(xx*yy - xy^2) + (pi - theta) * xy ) / (2*pi),
    theta = acos( clip( xy / sqrt(xx*yy), -1, 1 ) ),
    xx' = xx / 2,   yy' = yy / 2  (the /2 replaces the usual sqrt(2) gain),

with the same float32 stabilisation as the reference: ``+ f32_tiny`` under
the rsqrt, the cosine clamped to [-1, 1], the sine argument clamped >= 0,
and the *same-example* entries overwritten with ``xx'`` so the Gram diagonal
stays exactly consistent (reference: cnn_gp/kernels.py:146-162).

Lowering: plain jnp — XLA fuses the whole chain into one elementwise loop
on every backend.  A standalone Pallas kernel measured 2x SLOWER (fusion
barrier; round 1) and the whole-network fused Pallas megakernel measured
0.84x (round 2, ops/megakernel.py + BASELINE.md "Megakernel verdict"), so
XLA is the only production lowering.  ``acos_f32`` is the Cephes-style
polynomial arccos (sqrt + fma only, ~1 ulp float32) that both this path
(settings.acos_impl="poly") and the megakernel evaluate.

The same-example fix-up is driven by a ``[Nx, Ny]`` mask (see
``KernelPatch.diag_mask``) instead of the reference's eye matrix, so one
compiled program serves diagonal *and* off-diagonal Gram tiles.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..kernel_patch import KernelPatch

__all__ = ["relu_transform", "acos_f32", "DEFAULT_METHOD"]

F32_TINY = float(np.finfo(np.float32).tiny)
_HALF_PI = math.pi / 2.0

DEFAULT_METHOD = "auto"


def acos_f32(x: jax.Array) -> jax.Array:
    """float32 arccos from sqrt+fma only (Cephes asinf polynomial).

    Mosaic (Pallas TPU) has no acos/asin/atan primitives, so the fused
    kernel needs its own.  Max abs error ~1e-7 over [-1, 1]; relative
    accuracy is preserved near +-1 via acos(x) = 2*asin(sqrt((1-x)/2)).
    Inputs must already be clamped to [-1, 1] (the ReLU transform does).
    """
    a = jnp.abs(x)
    big = a > 0.5
    z_big = 0.5 * (1.0 - a)
    z = jnp.where(big, z_big, a * a)
    t = jnp.where(big, jnp.sqrt(z_big), a)
    p = ((((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2) * z
          + 7.4953002686e-2) * z + 1.6666752422e-1)
    asin_core = t + t * z * p          # = asin(t) for t in [0, sqrt(0.5)]
    acos_abs = jnp.where(big, 2.0 * asin_core, _HALF_PI - asin_core)
    return jnp.where(x < 0, math.pi - acos_abs, acos_abs)


def _xy_update(xy, xx_yy, acos_fn):
    """Core elementwise map shared by both lowerings (no mask fix)."""
    cos_theta = jnp.clip(xy * jax.lax.rsqrt(xx_yy), -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(xx_yy - xy * xy, 0.0))
    theta = acos_fn(cos_theta)
    return (sin_theta + (math.pi - theta) * xy) * (0.5 / math.pi)


# ---------------------------------------------------------------------------
# XLA lowering
# ---------------------------------------------------------------------------

def _xy_update_factored(xy, xx, yy, acos_fn):
    """Same map with per-row/per-column factors hoisted out of the pair
    grid: rsqrt and sqrt run on O((Nx+Ny)*S) elements instead of
    O(Nx*Ny*S), and sin(theta) is recovered from cos(theta).  Deviates
    from the reference's rounding by ~1 ulp (covered by the 1e-5 parity
    suite); disable with settings.relu_impl="reference"."""
    r_xx = jax.lax.rsqrt(xx + F32_TINY)[:, None]
    r_yy = jax.lax.rsqrt(yy + F32_TINY)[None, :]
    s_xx = jnp.sqrt(xx + F32_TINY)[:, None]
    s_yy = jnp.sqrt(yy + F32_TINY)[None, :]
    # (r_xx * r_yy) first: the factor is symmetric under (i, j) swap, so
    # Gram tiles stay *exactly* symmetric (a*b == b*a in IEEE; a chained
    # xy*r_xx*r_yy would associate differently across the diagonal)
    cos_theta = jnp.clip(xy * (r_xx * r_yy), -1.0, 1.0)
    sin_theta = (s_xx * s_yy) * jnp.sqrt(
        jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    pi_minus_theta = acos_fn(-cos_theta)   # acos(-c) = pi - acos(c)
    return (sin_theta + pi_minus_theta * xy) * (0.5 / math.pi)


def _relu_xla(kp: KernelPatch) -> KernelPatch:
    from .. import settings
    acos_fn = acos_f32 if settings.acos_impl == "poly" else jnp.arccos
    xx_half = kp.xx * 0.5
    if kp.diag:
        if kp.same:
            # Reference: same & diag => xy' = xx' exactly
            # (cnn_gp/kernels.py:157-158).
            return KernelPatch(xx_half, xx_half, xx_half, kp.same, kp.diag)
        xx_yy = kp.xx * kp.yy + F32_TINY
        xy = _xy_update(kp.xy, xx_yy, acos_fn)
        return KernelPatch(xy, xx_half, kp.yy * 0.5, kp.same, kp.diag)

    mask = kp.resolve_diag_mask()
    xy_in = kp.xy
    if mask is not None and settings.grad_safe:
        # Double-where: same-example entries sit at cos(theta) = 1, where
        # acos/sqrt have infinite local jacobians; their outputs are
        # overwritten below (zero cotangent), but inf * 0 = NaN under
        # jax.grad.  Feeding a neutral input (cos = 0) to the discarded
        # branch keeps gradients finite without changing any primal.
        xy_in = jnp.where(mask[:, :, None, None], 0.0, xy_in)
    if settings.relu_impl == "fast":
        xy = _xy_update_factored(xy_in, kp.xx, kp.yy, acos_fn)
    else:
        xx_yy = kp.xx[:, None] * kp.yy[None, :] + F32_TINY
        xy = _xy_update(xy_in, xx_yy, acos_fn)
    if mask is not None:
        # Same-example entries must equal xx' exactly
        # (cnn_gp/kernels.py:160-162).
        xy = jnp.where(mask[:, :, None, None],
                       jnp.broadcast_to(xx_half[:, None], xy.shape), xy)
    yy_half = xx_half if kp.same else kp.yy * 0.5
    return KernelPatch(xy, xx_half, yy_half, kp.same, kp.diag, kp.diag_mask)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def relu_transform(kp: KernelPatch, method: str = DEFAULT_METHOD
                   ) -> KernelPatch:
    if method == "auto":
        # Measured on TPU v5e (see BASELINE.md): the XLA lowering wins —
        # jnp code fuses into the surrounding conv chain, while a
        # standalone pallas_call is a fusion barrier that forces the
        # [Nx, Ny, W, H] tensor through HBM on both sides (round-1
        # measurement), and even the whole-network fused Pallas kernel
        # (ops/megakernel.py) measured 0.84x of this path (round 2,
        # BASELINE.md "Megakernel verdict").
        method = "xla"
    if method == "xla":
        return _relu_xla(kp)
    raise ValueError(f"unknown relu method {method!r}")
