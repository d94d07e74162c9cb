"""Width-100 MC covariance checks (slow, real TPU).

Round-2 VERDICT #6 asked for a seeded width-100 covariance check
involving the residual config.  Running it surfaced what the reference's
own README documents (reference: README.md:194-205): the residual
config's finite networks do NOT converge to its kernel — the deliberately
replicated paper bug sums branches after the ReLU, whose outputs are
non-Gaussian and non-zero-mean, so the branch cross-moments the Sum
kernel drops are real (measured mean_rel ~1.16, z ~50 at width 100).
The kernel itself is still valid (it corresponds to a *different*
network with 1x1 readouts after each ReLU, per the reference README).

So there are two tests: agreement at width 100 for the ConvNet GP config
(a true GP correspondence), and the *divergence signature* for the
residual config (faithful replication of the bug, asserted
quantitatively).  Each width-100 run costs ~1e14 flops; the tests spawn
subprocesses on the REAL TPU (stripping the conftest's forced-CPU env)
and skip when no TPU is reachable.  The full 3-config x 4-width battery
artifacts live in docs/figures/ (exp_random_nn/run.bash).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    env = dict(os.environ)
    # undo the conftest's CPU forcing so the subprocess gets the real chip
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("CNN_GP_TPU_TEST_BACKEND", None)
    return env


def _probe_tpu(env, timeout=180):
    """Bounded TPU reachability probe (shared helper: the tunneled backend
    HANGS rather than failing during outages, so mc_width_check's own
    exit-42 check can never fire; without this probe each width-100 test
    burns its full subprocess timeout before reporting).  An unreachable
    backend is an environment condition, not a code failure — skip."""
    from cnn_gp_tpu.utils.tpu_probe import probe_tpu
    if not probe_tpu(timeout, env=env):
        pytest.skip("no reachable TPU for the width-100 MC run "
                    "(no backend, or tunnel outage)")


def _run_width_check(config, **kw):
    env = _tpu_env()
    _probe_tpu(env)
    args = [sys.executable, "-m", "scripts.mc_width_check",
            f"--config={config}", "--channels=100",
            "--n_samples=4000", "--n_images=16", "--seed=0"]
    args += [f"--{k}={v}" for k, v in kw.items()]
    try:
        r = subprocess.run(args, capture_output=True, text=True, cwd=REPO,
                           env=env, timeout=3000)
    except subprocess.TimeoutExpired:
        pytest.skip("width-100 MC run timed out (tunnel outage mid-run)")
    if r.returncode == 42:
        pytest.skip("no TPU backend for the width-100 MC run")
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_width100_convnet_covariance():
    out = _run_width_check("mnist_paper_convnet_gp")
    # 16x16 covariance entries, each within MC error bars of the kernel;
    # 6 sigma over 256 correlated entries is a comfortable seeded bound
    assert out["max_abs_z"] < 6.0, out
    assert out["mean_rel"] < 0.05, out


@pytest.mark.slow
def test_width100_residual_divergence():
    # The replicated paper bug: finite nets of the residual config do not
    # match its kernel (reference README.md:194-201).  mean_rel is the
    # sample-size-independent signature (measured ~1.16 at width 100);
    # asserting it stays large proves the bug is replicated, not fixed.
    out = _run_width_check("mnist_paper_residual_cnn_gp")
    assert out["mean_rel"] > 0.3, out
    assert out["max_abs_z"] > 10.0, out
