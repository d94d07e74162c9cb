"""Solver agreement on REAL paper-config Grams (slow).

Complements tests/test_chol_dist.py's synthetic matrices with the actual
kernels the paper solves: all solver paths must produce the float64 scipy
solution (reference: exp_mnist_resnet/classify_gp.py:17-27) on a real
`mnist_as_tf` ResNet-32 Gram.  The 4k-scale equivalents on the real TPU
are recorded in BASELINE.md (scripts/solver_validation.py).
"""

import numpy as np
import pytest

from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import (cg_solve_sharded, chol_solve_dist,
                                 gram_in_memory, make_mesh)


@pytest.mark.slow
def test_solvers_agree_on_resnet32_gram():
    import configs
    model = configs.load("mnist_as_tf").initial_model
    n = 256
    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=n, n_test=64, shape=(1, 28, 28), seed=3)
    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=64,
                                    progress=False), np.float64)
    kzx = np.asarray(gram_in_memory(model, te_x, tr_x, batch_size=64,
                                    progress=False), np.float64)
    y = solve.one_hot_targets(tr_y)
    mesh = make_mesh()

    a_ref = solve.solve_gp(kxx.copy(), y, method="scipy")
    scale = np.abs(a_ref).max()
    pred_ref = solve.predict(kzx, a_ref)

    a_ir = solve.solve_gp(kxx.copy(), y, method="chol_ir")
    np.testing.assert_allclose(a_ir, a_ref, rtol=1e-6, atol=1e-9 * scale)

    a_dist, rel, _ = chol_solve_dist(kxx.copy(), y, mesh=mesh, block=64)
    assert rel < 1e-9, rel
    np.testing.assert_allclose(a_dist, a_ref, rtol=1e-6, atol=1e-9 * scale)
    np.testing.assert_array_equal(solve.predict(kzx, a_dist), pred_ref)

    a_cg, rel_cg, iters = cg_solve_sharded(kxx.copy(), y, mesh=mesh,
                                           tol=1e-8, maxiter=3000)
    assert rel_cg < 1e-7, (rel_cg, iters)
    np.testing.assert_array_equal(solve.predict(kzx, a_cg), pred_ref)
