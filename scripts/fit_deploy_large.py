"""Fit small (or AT paper scale), deploy at paper scale: evidence-fitted
hyperparameters evaluated by the full device-resident 50k classifier on
held-out accuracy AND held-out log predictive density.

The reference fixes var_weight=2.79 / var_bias=7.86 by random search and
offers no way to do better (reference: configs/mnist_paper_convnet_gp.py:
16-30).  This protocol does what a practitioner would: fit the ConvNet
GP's 16 per-layer variance leaves by type-II ML on an affordable subset
(``--n_fit``, minutes on one chip via the device-resident probed path;
``--n_fit=50000`` fits at FULL paper scale), persist them
(`cnn_gp_tpu.fit.save_leaves`), then evaluate init / fitted / paper
hyperparameters at deploy scale (``--n_large`` train examples, hard
MNIST variant with ``--label_noise`` flips) through
`classify_device_large` with posterior variances — held-out accuracy,
train log evidence, and held-out LPD (mean ± SE) per model, so the
model-selection story is measured on a metric that keeps discriminating
after accuracy saturates (VERDICT r4 item 1).

    python -m scripts.fit_deploy_large --n_fit=4096 --n_large=50000
    python -m scripts.fit_deploy_large --n_fit=50000 --steps=15  # at-scale

Results: BASELINE.md "Fit small, deploy at 50k" / "Held-out log
predictive density".
"""

import time

import absl.app
import absl.flags
import numpy as np

from cnn_gp_tpu.fit import fit_large, load_leaves, save_leaves
from cnn_gp_tpu.ops import solve
from cnn_gp_tpu.parallel import classify_device_large
from scripts.fit_paper_scale import hard_mnist, paper_convnet

FLAGS = absl.flags.FLAGS


def main(_):
    # fit split and large split drawn from the same hard distribution
    # (different seeds inside hard_mnist: train seed 1, held-out seed 2)
    fit_x, fit_y, _, _ = hard_mnist(FLAGS.n_fit, 1,
                                    flip_frac=FLAGS.label_noise)
    tr_x, tr_y, te_x, te_y = hard_mnist(FLAGS.n_large, FLAGS.n_test,
                                        flip_frac=FLAGS.label_noise)
    y_fit = solve.one_hot_targets(fit_y, dtype=np.float32)

    if FLAGS.load_fitted:
        # eval-only re-entry: graft previously fitted leaves (e.g. after a
        # tunnel outage interrupted the deploy leg of a finished fit)
        fitted = load_leaves(
            paper_convnet(FLAGS.vw_init, FLAGS.vb_init, learnable=True),
            FLAGS.load_fitted)
        print(f"loaded fitted leaves from {FLAGS.load_fitted}", flush=True)
    else:
        t0 = time.perf_counter()
        fitted, losses = fit_large(
            paper_convnet(FLAGS.vw_init, FLAGS.vb_init, learnable=True),
            fit_x, y_fit, steps=FLAGS.steps,
            learning_rate=FLAGS.learning_rate,
            batch_size=FLAGS.batch_size, verbose=True, grad="probed",
            probes=FLAGS.probes, tile_fraction=FLAGS.tile_fraction,
            refine_iters=0, block=FLAGS.fit_block)
        print(f"fit at n={FLAGS.n_fit}: {FLAGS.steps} steps in "
              f"{time.perf_counter() - t0:.1f}s  nmll {losses[0]:.6g} -> "
              f"best {np.min(losses):.6g} (trajectory: "
              f"{np.round(losses, 1).tolist()})", flush=True)
        if FLAGS.save_fitted:
            save_leaves(fitted, FLAGS.save_fitted)

    wanted = [s.strip() for s in FLAGS.eval_models.split(",") if s.strip()]
    for name, model in (("init", paper_convnet(FLAGS.vw_init,
                                                FLAGS.vb_init)),
                        ("paper", paper_convnet(2.79, 7.86)),
                        ("fitted", fitted)):
        if name not in wanted:
            continue
        t0 = time.perf_counter()
        accs, info = classify_device_large(
            model, tr_x, tr_y, (te_x, te_y),
            batch_size=FLAGS.batch_size, block=FLAGS.block,
            jitter=FLAGS.jitter, variances=True, verbose=False)
        lpd, lpd_se, _ = solve.gaussian_lpd(
            info["scores"][0], info["variances"][0], te_y,
            info["jitter_raw"])
        print(f"{name:>7} @ n={FLAGS.n_large}: held-out acc {accs[0]:.4f}"
              f"  train log evidence {info['log_evidence']:.6g}"
              f"  held-out LPD {lpd:.4f} +- {lpd_se:.4f}"
              f"  rel_residual {info['rel_residual']:.2e}"
              f"  ({time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_integer("n_fit", 4096, "fit-split size (type-II ML); "
                     "50000 fits at full paper scale")
    f.DEFINE_integer("n_large", 50000, "deploy-split train size")
    f.DEFINE_integer("n_test", 10000, "held-out examples at deploy scale")
    f.DEFINE_integer("batch_size", 128, "Gram tile size")
    f.DEFINE_integer("block", 2048, "factor block size (classify)")
    f.DEFINE_integer("fit_block", 1024, "factor block size (probed fit)")
    f.DEFINE_integer("steps", 20, "fit steps")
    f.DEFINE_integer("probes", 16, "Hutchinson probes")
    f.DEFINE_float("tile_fraction", 0.25, "fit tile subsample fraction")
    f.DEFINE_float("learning_rate", None, "adam learning rate (log "
                   "space); default resolves to 0.05 for the probed "
                   "gradient, with the overshoot guard on")
    f.DEFINE_float("label_noise", 0.05, "label-flip fraction of the hard "
                   "task (0 = discriminative zero-noise variant)")
    f.DEFINE_float("jitter", 1e-6, "relative jitter for the large solve")
    f.DEFINE_float("vw_init", 1.0, "initial var_weight (config units)")
    f.DEFINE_float("vb_init", 1.0, "initial var_bias")
    f.DEFINE_string("save_fitted", "", "persist fitted leaves (.npz)")
    f.DEFINE_string("load_fitted", "", "skip fitting; load leaves from "
                    "this .npz (eval-only re-entry)")
    f.DEFINE_string("eval_models", "init,paper,fitted", "which deploy "
                    "rows to run (comma list; baselines already measured "
                    "elsewhere can be skipped)")
    absl.app.run(main)
