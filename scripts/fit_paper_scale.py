"""Type-II ML at paper scale: fit the ConvNet GP's variance
hyperparameters on a hard task and compare against the paper's
random-searched values.

The reference fixes var_weight=2.79 / var_bias=7.86 (found by random
search, reference: configs/mnist_paper_convnet_gp.py:16-30); it ships no
way to optimise them.  This script fits per-layer learnable
(var_weight, var_bias) leaves of the SAME architecture by exact marginal
likelihood (`cnn_gp_tpu.fit.fit_large` — tiled Gram + evidence-identity
tile-VJP gradients, so no whole-matrix program is ever jitted) at
N=2048 on the hard non-separable MNIST variant, then reports held-out
accuracy and train-set GP log evidence for

    init   — the mis-initialised starting point,
    fitted — after `--steps` of fit_large,
    paper  — the reference's 2.79 / 7.86.

    python -m scripts.fit_paper_scale --n_train=2048 --steps=30

Results (real v5e, hard MNIST variant): BASELINE.md "Type-II ML at
scale".
"""

import time

import absl.app
import absl.flags
import numpy as np

import cnn_gp_tpu as G
from cnn_gp_tpu.fit import fit_large
from cnn_gp_tpu.ops import solve
from scripts.make_fake_dataset import _digits

FLAGS = absl.flags.FLAGS


def paper_convnet(vw, vb, learnable=False):
    """The paper ConvNet GP architecture with parameterised variances
    (reference: configs/mnist_paper_convnet_gp.py:25-36; conv layers use
    var_weight * 7^2 exactly as the config does)."""
    layers = []
    for _ in range(7):
        layers += [G.Conv2d(kernel_size=7, padding="same",
                            var_weight=vw * 7 ** 2, var_bias=vb,
                            learnable=learnable),
                   G.ReLU()]
    return G.Sequential(*layers,
                        G.Conv2d(kernel_size=28, padding=0, var_weight=vw,
                                 var_bias=vb, learnable=learnable))


def hard_mnist(n_train, n_test, flip_frac=0.05):
    """The hard non-separable MNIST variant (blended prototypes, heavy
    noise, ``flip_frac`` label flips — 0 gives the zero-label-noise
    variant whose ceiling can discriminate kernels) as float32 NCHW in
    [0, 1] — the same pixel scaling the dataset loader applies to the
    on-disk files."""
    tr_x, tr_y = _digits(n_train, 28, seed=1, hard=True,
                         flip_frac=flip_frac)
    te_x, te_y = _digits(n_test, 28, seed=2, proto_seed=1, hard=True,
                         flip_frac=flip_frac)
    as_f32 = lambda a: (a[:, None].astype(np.float32) / 255.0)
    return as_f32(tr_x), tr_y, as_f32(te_x), te_y


def evaluate(model, tr_x, tr_y, te_x, te_y, batch_size, jitter_rel):
    """Held-out accuracy + train log evidence + held-out log predictive
    density through the float64 scipy pipeline (exact at this N;
    reference: exp_mnist_resnet/classify_gp.py:17-27 — the reference
    reports accuracy only).  Returns (acc, lml, lpd_mean, lpd_se)."""
    from cnn_gp_tpu.parallel import gram_in_memory

    kxx = np.asarray(gram_in_memory(model, tr_x, batch_size=batch_size,
                                    progress=False), np.float64)
    jr = jitter_rel * float(np.mean(np.diagonal(kxx)))
    y = solve.one_hot_targets(tr_y)
    lml = solve.log_marginal_likelihood(kxx, y, jitter_rel=jitter_rel)
    a = solve.solve_gp(kxx, y, jitter=jr, method="scipy")
    kzx = np.asarray(gram_in_memory(model, te_x, tr_x,
                                    batch_size=batch_size, progress=False),
                     np.float64)
    acc = solve.accuracy(solve.predict(kzx, a), te_y)
    kzz_d = np.asarray(model(te_x, diag=True), np.float64)
    lpd, lpd_se, _ = solve.log_predictive_density(
        kxx, kzx, kzz_d, tr_y, te_y, jitter_rel=jitter_rel)
    del kxx
    return acc, lml, lpd, lpd_se


def main(_):
    tr_x, tr_y, te_x, te_y = hard_mnist(FLAGS.n_train, FLAGS.n_test,
                                        flip_frac=FLAGS.label_noise)
    y_fit = solve.one_hot_targets(tr_y, dtype=np.float32)
    b = FLAGS.batch_size

    rows = []

    def report(name, model):
        if FLAGS.timing_only:
            return
        t0 = time.perf_counter()
        acc, lml, lpd, lpd_se = evaluate(model, tr_x, tr_y, te_x, te_y, b,
                                         FLAGS.jitter)
        rows.append((name, acc, lml, lpd, lpd_se))
        print(f"{name:>7}: held-out acc {acc:.4f}  train log evidence "
              f"{lml:.6g}  held-out LPD {lpd:.4f} +- {lpd_se:.4f}"
              f"  ({time.perf_counter() - t0:.1f}s)", flush=True)

    report("init", paper_convnet(FLAGS.vw_init, FLAGS.vb_init))
    report("paper", paper_convnet(2.79, 7.86))

    t0 = time.perf_counter()
    fitted, losses = fit_large(
        paper_convnet(FLAGS.vw_init, FLAGS.vb_init, learnable=True),
        tr_x, y_fit, steps=FLAGS.steps, learning_rate=FLAGS.learning_rate,
        jitter=FLAGS.jitter, batch_size=b, verbose=True,
        grad=FLAGS.grad, probes=FLAGS.probes, block=FLAGS.block,
        tile_fraction=FLAGS.tile_fraction,
        refine_iters=FLAGS.refine_iters)
    print(f"fit_large: {FLAGS.steps} steps in {time.perf_counter() - t0:.1f}s"
          f"  nmll {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
    vws = [float(m.var_weight) / (7 ** 2 if m.kernel_size == 7 else 1)
           for m in fitted.mods if isinstance(m, G.Conv2d)]
    vbs = [float(m.var_bias) for m in fitted.mods
           if isinstance(m, G.Conv2d)]
    print(f"fitted per-layer var_weight (config units): "
          f"{np.round(vws, 3).tolist()}", flush=True)
    print(f"fitted per-layer var_bias: {np.round(vbs, 3).tolist()}",
          flush=True)
    if FLAGS.save_fitted:
        from cnn_gp_tpu.fit import save_leaves
        save_leaves(fitted, FLAGS.save_fitted)
        print(f"fitted leaves saved to {FLAGS.save_fitted} (reload with "
              f"cnn_gp_tpu.fit.load_leaves onto the same architecture)",
              flush=True)
    report("fitted", fitted)

    if FLAGS.timing_only:
        return
    init_acc, init_lml, init_lpd, init_se = rows[0][1:]
    paper_acc, paper_lml, paper_lpd, paper_se = rows[1][1:]
    fit_acc, fit_lml, fit_lpd, fit_se = rows[2][1:]
    print(f"\nsummary: fitted vs paper: acc {fit_acc:.4f} vs {paper_acc:.4f}"
          f", evidence {fit_lml:.6g} vs {paper_lml:.6g}, "
          f"LPD {fit_lpd:.4f}+-{fit_se:.4f} vs {paper_lpd:.4f}"
          f"+-{paper_se:.4f}; "
          f"fitted vs init: acc {fit_acc - init_acc:+.4f}, "
          f"evidence {fit_lml - init_lml:+.6g}, "
          f"LPD {fit_lpd - init_lpd:+.4f} "
          f"({(fit_lpd - init_lpd) / max(np.hypot(fit_se, init_se), 1e-12):+.1f} SE)",
          flush=True)


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_integer("n_train", 2048, "training examples")
    f.DEFINE_integer("n_test", 2048, "held-out examples")
    f.DEFINE_integer("batch_size", 128, "Gram tile size")
    f.DEFINE_integer("steps", 30, "fit_large optimisation steps")
    f.DEFINE_float("learning_rate", None, "adam learning rate (log "
                   "space); default resolves per gradient mode (0.1 "
                   "exact / 0.05 probed) with the overshoot guard on")
    f.DEFINE_float("label_noise", 0.05, "fraction of flipped labels in "
                   "the hard task (0 = the discriminative zero-noise "
                   "variant)")
    f.DEFINE_float("jitter", 1e-6, "relative jitter (vs mean Gram diag)")
    f.DEFINE_float("vw_init", 1.0, "initial var_weight (config units)")
    f.DEFINE_float("vb_init", 1.0, "initial var_bias")
    f.DEFINE_string("grad", "exact", "'exact' (host f64 inverse, <=16k) "
                    "or 'probed' (fully device-resident Hutchinson "
                    "cotangents — the path past the host ceiling)")
    f.DEFINE_integer("probes", 16, "Hutchinson probe count (grad=probed)")
    f.DEFINE_integer("block", 1024, "factor block size (grad=probed)")
    f.DEFINE_boolean("timing_only", False, "skip the scipy f64 "
                     "evaluation legs (impossible past ~16k on this "
                     "host) — just run and time the fit steps")
    f.DEFINE_float("tile_fraction", 1.0, "grad=probed: subsample this "
                   "fraction of the strictly-upper tiles per step "
                   "(unbiased, T/k-rescaled); the VJP sweep cost scales "
                   "with it")
    f.DEFINE_integer("refine_iters", 1, "grad=probed: residual sweeps "
                     "for the solve (0 = raw factor solve, drops one "
                     "matvec sweep per step)")
    f.DEFINE_string("save_fitted", "", "persist the fitted model's "
                    "hyperparameter leaves to this .npz "
                    "(cnn_gp_tpu.fit.save_leaves)")
    absl.app.run(main)
