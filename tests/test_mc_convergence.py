"""Width-100 MC covariance agreement for the residual config (slow, TPU).

Round-2 VERDICT #6: a seeded slow test asserting empirical-vs-analytic
covariance agreement at width 100 for the residual config — the one with
the deliberately replicated non-GP paper bug (reference:
configs/mnist_paper_residual_cnn_gp.py:1-14): its finite nets are not
Gaussian, but their second moments still converge to the analytic kernel,
which is what the kernel path computes.

The width-100 run costs ~1e14 flops; the test spawns a subprocess on the
REAL TPU (stripping the conftest's forced-CPU env) and skips when no TPU
is reachable.  The full 3-config x 4-width battery artifact lives in
docs/figures/ (exp_random_nn/run.bash).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_width100_residual_covariance():
    env = dict(os.environ)
    # undo the conftest's CPU forcing so the subprocess gets the real chip
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("CNN_GP_TPU_TEST_BACKEND", None)
    r = subprocess.run(
        [sys.executable, "-m", "scripts.mc_width_check",
         "--config=mnist_paper_residual_cnn_gp", "--channels=100",
         "--n_samples=4000", "--n_images=16", "--seed=0"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=3000)
    if r.returncode == 42:
        pytest.skip("no TPU backend for the width-100 MC run")
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # 16x16 covariance entries, each within MC error bars of the kernel;
    # 6 sigma over 256 correlated entries is a comfortable seeded bound
    assert out["max_abs_z"] < 6.0, out
    assert out["mean_rel"] < 0.05, out
