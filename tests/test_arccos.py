"""Arccos/ReLU transform tests: polynomial acos accuracy and
XLA-vs-Pallas(interpret) agreement."""

import jax.numpy as jnp
import numpy as np

from cnn_gp_tpu import KernelPatch
from cnn_gp_tpu.ops import arccos


def test_acos_poly_accuracy():
    x = np.linspace(-1.0, 1.0, 200001, dtype=np.float32)
    got = np.asarray(arccos.acos_f32(jnp.asarray(x)))
    want = np.arccos(x.astype(np.float64))
    # bounded by ~1.5 ulp of pi in float32
    assert np.max(np.abs(got - want)) < 5e-7


def test_acos_poly_endpoints():
    got = np.asarray(arccos.acos_f32(jnp.asarray([-1.0, 0.0, 1.0])))
    np.testing.assert_allclose(got, [np.pi, np.pi / 2, 0.0], atol=1e-7)


def _patch(nx=6, ny=9, w=4, h=4, same=False, diag=False, mask=None, seed=0):
    r = np.random.RandomState(seed)
    xx = (r.rand(nx, w, h).astype(np.float32) + 0.3)
    yy = (r.rand(ny, w, h).astype(np.float32) + 0.3)
    if diag:
        xy = (r.rand(nx, w, h).astype(np.float32) - 0.5) * np.sqrt(xx * yy)
    else:
        lim = np.sqrt(xx[:, None] * yy[None])
        xy = (r.rand(nx, ny, w, h).astype(np.float32) - 0.5) * 2 * lim
    return KernelPatch(jnp.asarray(xy), jnp.asarray(xx), jnp.asarray(yy),
                       same, diag, mask)


def test_same_block_diag_fixed_exactly():
    """Same-block diagonal entries equal xx/2 exactly after the transform.
    (The standalone Pallas lowering this used to cross-check was removed
    after losing to XLA fusion in measurement; the whole-network Pallas
    experiment lives in ops/megakernel.py + tests/test_megakernel.py.)"""
    kp = _patch(nx=8, ny=8, same=True)
    b = arccos.relu_transform(kp, method="xla")
    d = np.asarray(b.xy)[np.arange(8), np.arange(8)]
    np.testing.assert_array_equal(d, np.asarray(kp.xx) * 0.5)


def test_mask_driven_fix_matches_eye_path():
    """An off-diagonal tile with an explicit global mask must equal the
    same=True eye path where the mask bits line up."""
    kp_same = _patch(nx=8, ny=8, same=True, seed=3)
    mask = jnp.eye(8, dtype=bool)
    kp_masked = KernelPatch(kp_same.xy, kp_same.xx, kp_same.yy,
                            False, False, mask)
    a = arccos.relu_transform(kp_same, method="xla")
    b = arccos.relu_transform(kp_masked, method="xla")
    np.testing.assert_allclose(np.asarray(a.xy), np.asarray(b.xy),
                               rtol=1e-6, atol=1e-7)


def test_same_diag_shortcut():
    kp = _patch(nx=5, ny=5, same=True, diag=True)
    out = arccos.relu_transform(kp, method="xla")
    np.testing.assert_array_equal(np.asarray(out.xy),
                                  np.asarray(kp.xx) * 0.5)


def test_relu_matches_reference(ref_kernels, rng):
    import torch
    kp = _patch(nx=7, ny=5, seed=2)
    ref = ref_kernels.ReLU()
    with torch.no_grad():
        ref_kp = sys_ref_patch(ref_kernels, kp)
        out_ref = ref.propagate(ref_kp)
    ours = arccos.relu_transform(kp, method="xla")
    np.testing.assert_allclose(np.asarray(ours.xy),
                               out_ref.xy.numpy().reshape(7, 5, 4, 4),
                               rtol=1e-5, atol=1e-6)


def sys_ref_patch(ref_kernels, kp):
    """Build the reference's NonlinKP from our canonical patch."""
    import sys
    import torch
    ref_patch_mod = sys.modules["ref_cnn_gp.kernel_patch"]
    nx, ny = kp.nx, kp.ny
    w, h = kp.spatial
    return ref_patch_mod.NonlinKP(
        kp.same, kp.diag,
        torch.from_numpy(np.asarray(kp.xy)).reshape(nx, ny, w, h),
        torch.from_numpy(np.asarray(kp.xx)).reshape(nx, 1, w, h),
        torch.from_numpy(np.asarray(kp.yy)).reshape(ny, w, h))
