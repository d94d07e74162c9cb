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
    f.l_loc = f.diags = None
    f._solvers.clear()

    # --- device-blocks extension (`extend_device`) -------------------
    # The host path above device_puts an [n_pad, m] right-hand side
    # (134 MB at the 16k/2048 defaults) — its measured wall-clock
    # bottleneck on tunneled runtimes.  Here the cross blocks are cut
    # from the device matrix directly (in production the regen-mode
    # IncrementalGP assembles them by tile regeneration), so nothing
    # O(N*m) crosses the link.
    # capacity n+2m: a SECOND device extension measures the warm cost —
    # the streaming pattern (IncrementalGP compiles once per batch width,
    # then every add reuses the programs), vs the cold number that folds
    # ~all the program compiles in
    f2 = _ShardedFactor(mesh, n, block, capacity=n + 2 * m)
    with jax.default_matmul_precision("highest"):
        k_again = make_spd(jax.random.PRNGKey(0))
        w_dev, c_dev = jax.jit(lambda k: (
            jnp.zeros((f2.n_pad, m), jnp.float32).at[:n].set(k[:n, n:]),
            k[n:, n:]))(k_again)
    _sync_fetch(c_dev[0, 0])
    del k_again
    with jax.default_matmul_precision("highest"):
        k_lead2 = jax.jit(lambda k: k[:n, :n])(make_spd(jax.random.PRNGKey(0)))
    _sync_fetch(k_lead2[0, 0])
    f2.factorize_device(k_lead2)
    _sync_fetch(f2.diags[0, 0, 0])
    t0 = time.perf_counter()
    f2.extend_device(w_dev, c_dev)
    _sync_fetch(f2.diags[-1, 0, 0])
    t_extend_dev = time.perf_counter() - t0
    a_ext2 = f2.solve(rhs.astype(np.float32))
    rel2 = (np.linalg.norm(a_ext2 - a_full)
            / max(np.linalg.norm(a_full), 1e-30))
    assert np.isfinite(rel2) and rel2 < 1e-3, f"device ext broke: {rel2}"

    # warm re-extension: a well-conditioned synthetic cross block into
    # the identity-padded rows [n+m, n+2m) (the factor there is exactly
    # I, so any modest SPD extension works; we only time it)
    w2 = jax.jit(lambda: jnp.zeros((f2.n_pad, m), jnp.float32))()
    c2 = jax.jit(lambda: jnp.eye(m, dtype=jnp.float32))()
    _sync_fetch(c2[0, 0])
    t0 = time.perf_counter()
    f2.extend_device(w2, c2)
    _sync_fetch(f2.diags[-1, 0, 0])
    t_extend_warm = time.perf_counter() - t0

    print(f"n={n} m={m} block={block} "
          f"refactor(n+m)={t_refactor:.2f}s factor(n,cap)={t_factor_n:.2f}s "
          f"extend(host)={t_extend:.2f}s extend(device)={t_extend_dev:.2f}s "
          f"extend(device,warm)={t_extend_warm:.2f}s "
          f"speedup_host={t_refactor / t_extend:.1f}x "
          f"speedup_device={t_refactor / t_extend_dev:.1f}x "
          f"speedup_device_warm={t_refactor / t_extend_warm:.1f}x "
          f"solve_agreement_rel={rel:.2e}/{rel2:.2e}",
          flush=True)


if __name__ == "__main__":
    absl.flags.DEFINE_integer("n", 16384, "initial system size")
    absl.flags.DEFINE_integer("m", 2048, "rows added by extend")
    absl.flags.DEFINE_integer("block", 1024, "Cholesky block size")
    absl.app.run(main)
