"""Smoke tests for the driver entry artifact (__graft_entry__.py).

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(N)`` on a virtual N-device CPU mesh at the end of
every round; a refactor that breaks either is only discovered there —
after the round — unless the suite pins them.  No reference counterpart
(the reference has no driver artifact).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")


def test_entry_jits_and_matches_tile():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], args[1].shape[0])
    assert np.isfinite(np.asarray(out)).all()
    # the mask offsets differ (0 vs 8) so no pair is diagonal: the plain
    # cross-block kernel must agree exactly
    from cnn_gp_tpu.kernels import apply_kernel
    import configs
    model = configs.load("mnist_as_tf").initial_model
    want = apply_kernel(model, args[0], args[1], False, False, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_8(tmp_path):
    """The full 8-device dryrun in a clean subprocess (the same command
    the driver runs): sharded assembly + chol_dist + CG + device-resident
    classify with variances/evidence must all pass their own asserts."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, ENTRY, "multichip", "8"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "dryrun_multichip(8)" in r.stdout
