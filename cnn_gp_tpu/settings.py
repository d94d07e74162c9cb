"""Global lowering settings for the kernel compute path.

Selects how the two hot ops lower to TPU.  Read at trace time; the jitted
kernel entry points take a snapshot as a static argument so changing a
setting triggers a retrace (never a stale cache hit).
"""

from __future__ import annotations

import contextlib

# Box-filter lowering for Conv2d covariance:
# separable | direct | matmul | shifts.
conv_method = "separable"
# ReLU arccos transform lowering: auto | xla.  (The standalone Pallas
# lowering was removed after losing to XLA fusion in both round-1 and
# round-2 measurements; see ops/megakernel.py for the whole-network
# fused experiment.)
relu_method = "auto"
# arccos implementation inside the ReLU transform: "poly" (Cephes-style
# polynomial, ~15 fused VPU ops, abs err < 5e-7) | "exact" (jnp.arccos,
# which XLA lowers through atan2 -- several times more VPU work).
acos_impl = "poly"
# ReLU transform structure: "fast" hoists the rsqrt/sqrt of the row and
# column variances out of the pair grid and recovers sin from cos
# (~1 ulp deviation); "reference" follows the reference's exact op order.
relu_impl = "fast"
# Contraction precision for the input second-moment einsum.
moment_precision = "highest"
# Differentiation-safe ReLU transform: masked same-example entries get a
# neutral acos input (double-where) so jax.grad through the transform is
# finite — at |cos|=1 the acos/sqrt local jacobians are infinite and the
# zero cotangent from the output mask turns them into NaN, not 0.
# Off by default: the extra select per ReLU layer is pure overhead for
# the (non-differentiated) Gram path, whose primal is identical either
# way.  cnn_gp_tpu.fit enables it around its loss.
grad_safe = False


def snapshot():
    return (conv_method, relu_method, acos_impl, relu_impl,
            moment_precision, grad_safe)


@contextlib.contextmanager
def override(**kwargs):
    import cnn_gp_tpu.settings as s
    old = {k: getattr(s, k) for k in kwargs}
    try:
        for k, v in kwargs.items():
            setattr(s, k, v)
        yield
    finally:
        for k, v in old.items():
            setattr(s, k, v)
