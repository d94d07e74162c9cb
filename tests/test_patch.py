"""KernelPatch pytree + elementwise algebra tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_gp_tpu import KernelPatch


def make_patch(nx=3, ny=4, w=5, h=5, same=False, diag=False, seed=0):
    r = np.random.RandomState(seed)
    if diag:
        xy = r.randn(nx, w, h).astype(np.float32)
    else:
        xy = r.randn(nx, ny, w, h).astype(np.float32)
    xx = r.rand(nx, w, h).astype(np.float32) + 0.5
    yy = r.rand(ny, w, h).astype(np.float32) + 0.5
    return KernelPatch(jnp.asarray(xy), jnp.asarray(xx), jnp.asarray(yy),
                       same, diag)


def test_pytree_roundtrip():
    kp = make_patch(same=True)
    leaves, treedef = jax.tree_util.tree_flatten(kp)
    kp2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert kp2.same == kp.same and kp2.diag == kp.diag
    np.testing.assert_array_equal(kp.xy, kp2.xy)


def test_pytree_roundtrip_with_mask():
    kp = make_patch()
    kp = KernelPatch(kp.xy, kp.xx, kp.yy, kp.same, kp.diag,
                     jnp.zeros((3, 4), bool))
    leaves, treedef = jax.tree_util.tree_flatten(kp)
    kp2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert kp2.diag_mask is not None


def test_add_patches():
    a, b = make_patch(seed=0), make_patch(seed=1)
    c = a + b
    np.testing.assert_allclose(c.xy, np.asarray(a.xy) + np.asarray(b.xy))
    np.testing.assert_allclose(c.xx, np.asarray(a.xx) + np.asarray(b.xx))
    np.testing.assert_allclose(c.yy, np.asarray(a.yy) + np.asarray(b.yy))


def test_sum_builtin():
    """`sum()` starts from 0; KernelPatch must absorb it (reference:
    cnn_gp/kernels.py:252-254 relies on __radd__)."""
    patches = [make_patch(seed=i) for i in range(3)]
    c = sum(patches)
    expect = sum(np.asarray(p.xy) for p in patches)
    np.testing.assert_allclose(c.xy, expect, rtol=1e-6)


def test_scalar_mul():
    a = make_patch()
    c = a * 2.5
    np.testing.assert_allclose(c.xy, np.asarray(a.xy) * 2.5)
    c2 = 2.5 * a
    np.testing.assert_allclose(c2.xx, np.asarray(a.xx) * 2.5)


def test_resolve_diag_mask():
    same_block = make_patch(nx=4, ny=4, same=True)
    mask = same_block.resolve_diag_mask()
    np.testing.assert_array_equal(np.asarray(mask), np.eye(4, dtype=bool))
    cross = make_patch(same=False)
    assert cross.resolve_diag_mask() is None
