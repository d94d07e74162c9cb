"""Measure in-place factor extension vs from-scratch refactorisation.

Protocol (real chip, 1-device mesh): generate an equilibrated-like SPD
matrix of size n+m on device, factor the leading n x n block with
reserved capacity, extend by m rows (`_ShardedFactor.extend`), and
compare the wall against refactorising the full n+m system; verify the
two factors' float32 solves of the same system agree (asserted, not just
printed — a numerically broken extension aborts the run).  FLOPs:
extension is ~n_pad^2 m (one m-wide block forward solve + trailing
Schur) vs (n+m)^3/3 for the refactor, so the win grows as m/N shrinks.

    python -m scripts.extend_bench --n=16384 --m=2048 --block=1024

Timing note (CLAUDE.md): `block_until_ready` does not wait for remote
execution on the tunneled platform — every phase ends with a small host
fetch, which does.
"""

import time

import absl.app
import absl.flags
import numpy as np

FLAGS = absl.flags.FLAGS


def _sync_fetch(x):
    return float(np.asarray(x if x.ndim == 0 else x.reshape(-1)[0]))


def main(_):
    import jax
    import jax.numpy as jnp

    from cnn_gp_tpu.parallel import make_mesh
    from cnn_gp_tpu.parallel.chol_dist import _ShardedFactor

    n, m, block = FLAGS.n, FLAGS.m, FLAGS.block
    mesh = make_mesh()

    @jax.jit
    def make_spd(key):
        a = jax.random.normal(key, (n + m, n + m), jnp.float32)
        k = a @ a.T / (n + m)
        return k + jnp.eye(n + m, dtype=jnp.float32)   # diag ~2, cond mild

    with jax.default_matmul_precision("highest"):
        k_full = make_spd(jax.random.PRNGKey(0))
    _sync_fetch(k_full[0, 0])
    # host copies for the sub-blocks / verification rhs
    b_np = np.asarray(k_full[n:, :n])
    c_np = np.asarray(k_full[n:, n:])
    rhs = np.random.RandomState(1).randn(n + m, 10)

    # --- from-scratch factor of the full n+m system -----------------
    f_full = _ShardedFactor(mesh, n + m, block)
    t0 = time.perf_counter()
    f_full.factorize_device(k_full)          # consumes k_full
    _sync_fetch(f_full.diags[0, 0, 0])
    t_refactor = time.perf_counter() - t0
    a_full = f_full.solve(rhs.astype(np.float32))
    f_full.l_loc = f_full.diags = None
    f_full._solvers.clear()

    # --- factor n with capacity, then extend by m -------------------
    with jax.default_matmul_precision("highest"):
        k_lead = jax.jit(lambda k: k[:n, :n])(make_spd(jax.random.PRNGKey(0)))
    _sync_fetch(k_lead[0, 0])
    f = _ShardedFactor(mesh, n, block, capacity=n + m)
    t0 = time.perf_counter()
    f.factorize_device(k_lead)
    _sync_fetch(f.diags[0, 0, 0])
    t_factor_n = time.perf_counter() - t0

    t0 = time.perf_counter()
    f.extend(b_np, c_np)
    _sync_fetch(f.diags[-1, 0, 0])
    t_extend = time.perf_counter() - t0

    a_ext = f.solve(rhs.astype(np.float32))
    rel = (np.linalg.norm(a_ext - a_full)
           / max(np.linalg.norm(a_full), 1e-30))
    # gate, don't just report: a corrupted extension (e.g. a NaN factor)
    # must abort the benchmark, not print rel=nan and exit 0
    assert np.isfinite(rel) and rel < 1e-3, f"solve agreement broke: {rel}"
    print(f"n={n} m={m} block={block} "
          f"refactor(n+m)={t_refactor:.2f}s factor(n,cap)={t_factor_n:.2f}s "
          f"extend={t_extend:.2f}s speedup_vs_refactor="
          f"{t_refactor / t_extend:.1f}x solve_agreement_rel={rel:.2e}",
          flush=True)


if __name__ == "__main__":
    absl.flags.DEFINE_integer("n", 16384, "initial system size")
    absl.flags.DEFINE_integer("m", 2048, "rows added by extend")
    absl.flags.DEFINE_integer("block", 1024, "Cholesky block size")
    absl.app.run(main)
