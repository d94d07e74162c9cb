"""Bounded TPU-reachability probes for the tunneled backend.

The experimental "axon" TPU tunnel has two observed outage modes (see
CLAUDE.md "Environment gotchas"): backend initialisation HANGS inside C
(where SIGALRM never fires) for minutes to hours, or fails fast with a
"No jellyfish device found" RuntimeError.  Every probe therefore runs in
a fresh *subprocess* with a hard timeout — the only reliable bound.

Shared by bench.py, the width-100 MC tests, and any script wanting the
probe-first protocol; keeping one copy stops the timeout values and
success criteria from drifting apart.

No counterpart in the reference (it assumes healthy local CUDA devices);
this is tunnel-environment infrastructure.
"""

import subprocess
import sys
import time

__all__ = ["probe_tpu", "wait_for_tpu"]

# Executes, not just initialises: only a host fetch (np.asarray) truly
# syncs remote execution on this platform (block_until_ready does not).
# JAX_PLATFORMS is re-applied via jax.config first: the axon
# sitecustomize registers its backend at interpreter start and (as of
# round 3) the env var alone no longer forces the platform — the same
# reason cnn_gp_tpu.__init__ re-applies it.  Without this, a CPU-forced
# caller (tests, a deliberate CPU bench env) would "find" the tunnel TPU
# and defeat the gate this probe exists for.
_PROBE_CODE = (
    "import os, jax, numpy as np\n"
    "p = os.environ.get('JAX_PLATFORMS')\n"
    "if p:\n"
    "    try:\n"
    "        import jax.extend\n"
    "        jax.extend.backend.clear_backends()\n"
    "    except Exception:\n"
    "        pass\n"
    "    jax.config.update('jax_platforms', p)\n"
    "assert jax.default_backend() == 'tpu', jax.default_backend()\n"
    "x = jax.numpy.ones((128, 128))\n"
    "np.asarray(x @ x)\n"
    "print('TPU_OK')\n"
)


def probe_tpu(timeout_s=150.0, env=None):
    """True iff a real TPU backend initialises AND executes (through a
    host fetch) in a fresh subprocess within ``timeout_s``.

    ``env``: optional environment for the subprocess (tests use it to
    re-enable the TPU platform under a CPU-forcing conftest)."""
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           timeout=timeout_s, capture_output=True,
                           text=True, env=env)
        return r.returncode == 0 and "TPU_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu(budget_s, probe_timeout_s=150.0, sleep_s=60.0, env=None,
                 log=None):
    """Probe repeatedly until the TPU answers or ``budget_s`` runs out.

    Returns True on success, False when the budget is exhausted (the
    caller should then degrade explicitly rather than hang).  ``log``,
    if given, receives one progress string per failed probe."""
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        if probe_tpu(probe_timeout_s, env=env):
            return True
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        if log is not None:
            log(f"TPU probe {attempt} failed (tunnel outage?); retrying"
                f" ({remaining:.0f}s of wait budget left)")
        time.sleep(min(sleep_s, max(0.0, remaining)))
