"""Validate every solver on a REAL paper-config NNGP Gram.

Round-2 evidence task (VERDICT.md "What's weak" #1): the solvers were
previously proven only on well-conditioned synthetic SPD matrices.  This
script assembles a genuine `mnist_as_tf` (or any config's) Gram at
nontrivial N — whose diagonal reaches the ~1e12 scale the reference's
float64 assertion exists for (reference:
exp_mnist_resnet/classify_gp.py:19-23) — and runs the float64 scipy
reference solve next to the TPU-native paths (`chol_ir`, `chol_dist`,
mesh CG), reporting per-solver wall-clock, residuals, iteration counts,
solution agreement, and prediction agreement.

Usage (real TPU):
    python -m scripts.solver_validation --config=mnist_as_tf --n=4096
Virtual mesh / CPU:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m scripts.solver_validation --n=512 --cpu

Prints a markdown table (pasted into BASELINE.md).
"""

import time

import absl.app
import absl.flags
import numpy as np

FLAGS = absl.flags.FLAGS


def _assemble(model, n, n_test, batch, in_channels, side=28):
    """Kxx [n,n], Kzx [n_test,n], labels — on a real paper kernel with
    synthetic inputs (conditioning depends on the architecture and input
    statistics, not on which digits the pixels draw)."""
    from cnn_gp_tpu.data import synthetic_arrays
    from cnn_gp_tpu.parallel import gram_device, gram_in_memory

    tr_x, tr_y, te_x, te_y = synthetic_arrays(
        n_train=n, n_test=n_test, shape=(in_channels, side, side), seed=0)
    t0 = time.perf_counter()
    k_dev = None
    if n <= 16384:   # measured fine at 16k
        k_dev = gram_device(model, tr_x, batch_size=batch)
        kxx = np.asarray(k_dev, np.float64)
        kzx = np.asarray(gram_device(model, te_x, tr_x, batch_size=batch),
                         np.float64)
    else:   # stream tiles: a device-resident N^2 Gram + one huge fetch
        # destabilises tunneled runtimes at this scale (measured at 32k)
        kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=batch,
                                        progress=False), np.float64)
        kzx = np.asarray(gram_in_memory(model, te_x, tr_x, batch_size=batch,
                                        progress=False), np.float64)
    print(f"assembled Kxx {kxx.shape} + Kzx {kzx.shape} in "
          f"{time.perf_counter() - t0:.1f}s")
    return kxx, kzx, tr_y, te_y, k_dev


def _cond_estimate(kxx, jitter):
    """Condition number of the Jacobi-equilibrated system (what the float32
    factorisation actually sees)."""
    d = np.sqrt(np.diagonal(kxx) + jitter)
    ks = (kxx + jitter * np.eye(len(kxx))) / d[:, None] / d[None, :]
    w = np.linalg.eigvalsh(ks)
    return float(w[-1] / w[0]), float(w[0])


def main(_):
    import jax
    import configs
    from cnn_gp_tpu.ops import solve
    from cnn_gp_tpu.parallel import (cg_solve_sharded, chol_solve_dist,
                                     make_mesh)

    if FLAGS.cpu and jax.default_backend() != "cpu":
        import cnn_gp_tpu
        cnn_gp_tpu.use_platform("cpu")
    print(f"backend: {jax.default_backend()} x{len(jax.devices())}")

    config = configs.load(FLAGS.config)
    model = config.initial_model
    n, jitter = FLAGS.n, FLAGS.jitter
    kxx, kzx, tr_y, te_y, k_dev = _assemble(model, n, FLAGS.n_test,
                                            FLAGS.batch, config.in_channels)
    y = solve.one_hot_targets(tr_y)
    dmin, dmax = np.diagonal(kxx).min(), np.diagonal(kxx).max()
    print(f"diag range: [{dmin:.3e}, {dmax:.3e}]  "
          f"offdiag max: {np.abs(kxx - np.diag(np.diagonal(kxx))).max():.3e}")
    if FLAGS.eig:
        t0 = time.perf_counter()
        cond, lmin = _cond_estimate(kxx, jitter)
        print(f"equilibrated cond(Ks) = {cond:.3e} (lambda_min {lmin:.3e}, "
              f"eigvalsh {time.perf_counter() - t0:.0f}s)")

    mesh = make_mesh()
    results = {}
    solvers = FLAGS.solvers.split(",")

    def record(name, fn):
        t0 = time.perf_counter()
        a, extra = fn()
        dt = time.perf_counter() - t0
        r = y - (kxx @ a + jitter * a)
        rel = float(np.max(np.linalg.norm(r, axis=0)
                           / np.linalg.norm(y, axis=0)))
        pred = solve.predict(kzx, a)
        results[name] = dict(a=a, t=dt, rel=rel, pred=pred, extra=extra)
        print(f"{name:10s} {dt:8.1f}s  rel_resid {rel:.2e}  {extra}")

    if "scipy" in solvers:
        record("scipy", lambda: (
            solve.solve_gp(kxx.copy(), y, jitter=jitter, method="scipy"),
            "float64 LAPACK"))
    if "chol_ir" in solvers:
        record("chol_ir", lambda: (
            solve.solve_gp(kxx.copy(), y, jitter=jitter, method="chol_ir"),
            "whole-matrix f32 + IR"))
    if "chol_dist" in solvers:
        def _dist():
            a, rel, iters = chol_solve_dist(kxx.copy(), y, jitter=jitter,
                                            mesh=mesh, block=FLAGS.block,
                                            k_dev=k_dev)
            dev = " (device-resident gram)" if k_dev is not None else ""
            return a, f"blocked sharded f32 + IR, {iters} refinements{dev}"
        record("chol_dist", _dist)
    if "cg" in solvers:
        def _cg():
            # cg_solve_sharded applies jitter itself (matvec + jacobi
            # preconditioner) -- building kxx + jitter*eye here would
            # cost two N^2 float64 temporaries on the single-core host
            a, rel, iters = cg_solve_sharded(
                kxx, y, jitter=jitter, mesh=mesh,
                tol=FLAGS.cg_tol, maxiter=FLAGS.cg_maxiter)
            return a, f"jacobi-CG, {iters} iters"
        record("cg", _cg)

    base = results.get("scipy")
    print("\n| solver | wall | rel residual | vs scipy (rel) | "
          "pred agreement | notes |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        if base is not None and name != "scipy":
            scale = np.abs(base["a"]).max()
            vs = f"{np.abs(r['a'] - base['a']).max() / scale:.2e}"
            agree = f"{float(np.mean(r['pred'] == base['pred'])):.4f}"
        else:
            vs, agree = "—", "—"
        print(f"| {name} | {r['t']:.1f}s | {r['rel']:.2e} | {vs} | {agree} "
              f"| {r['extra']} |")
    accs = {name: solve.accuracy(r["pred"], te_y)
            for name, r in results.items()}
    print("test accuracy per solver:", accs)


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("config", "mnist_as_tf", "config to build the kernel")
    f.DEFINE_integer("n", 4096, "train Gram size")
    f.DEFINE_integer("n_test", 512, "test rows")
    f.DEFINE_integer("batch", 128, "Gram tile size")
    f.DEFINE_float("jitter", 0.0, "diagonal jitter")
    f.DEFINE_integer("block", 1024, "chol_dist block size")
    f.DEFINE_float("cg_tol", 1e-8, "CG tolerance")
    f.DEFINE_integer("cg_maxiter", 4000, "CG iteration cap")
    f.DEFINE_string("solvers", "scipy,chol_ir,chol_dist,cg",
                    "comma list of solvers to run")
    f.DEFINE_bool("eig", True, "compute the equilibrated condition number")
    f.DEFINE_bool("cpu", False, "force the CPU backend")
    absl.app.run(main)
