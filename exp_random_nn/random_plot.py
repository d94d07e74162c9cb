"""Publication figure: finite-NN convergence to the GP limit.

Rebuild of the reference plotter (reference: exp_random_nn/random_plot.py:
1-154): a 3x4 matplotlib figure over channel widths {3, 10, 30, 100} --
row A: histograms of normalised outputs vs the N(0,1) pdf;
row B: Q-Q plots against the limiting Gaussian;
row C: empirical vs analytic covariance scatter with the y=x line.

Usage: python -m exp_random_nn.random_plot <csv_dir> <out.pdf>
(the reference hard-codes its paths; we take them as argv).
"""

import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import scipy.stats  # noqa: E402

WIDTHS = [3, 10, 30, 100]
SEED = 1


def main(csv_dir: str, out_path: str):
    fig, axes = plt.subplots(3, len(WIDTHS), figsize=(3 * len(WIDTHS), 8))
    for col, c in enumerate(WIDTHS):
        samples = pd.read_csv(
            os.path.join(csv_dir, f"{c:04d}_{SEED:04d}_samples.csv"))
        cov = pd.read_csv(
            os.path.join(csv_dir, f"{c:04d}_{SEED:04d}_cov.csv"))
        r0 = samples["r0"].to_numpy()

        # Row A: histogram of normalised outputs vs N(0,1) pdf
        ax = axes[0, col]
        ax.hist(r0, bins=50, density=True, alpha=0.7)
        grid = np.linspace(-4, 4, 200)
        ax.plot(grid, scipy.stats.norm.pdf(grid), "k-", lw=1)
        ax.set_title(f"C = {c}")
        ax.set_xlim(-4, 4)
        if col == 0:
            ax.set_ylabel("density")

        # Row B: Q-Q plot vs limiting Gaussian
        ax = axes[1, col]
        qs = np.linspace(0.005, 0.995, 199)
        ax.plot(scipy.stats.norm.ppf(qs), np.quantile(r0, qs), ".",
                markersize=3)
        lim = [-3.5, 3.5]
        ax.plot(lim, lim, "k-", lw=1)
        ax.set_xlim(lim)
        ax.set_ylim(lim)
        if col == 0:
            ax.set_ylabel("sample quantiles")

        # Row C: empirical vs analytic covariance
        ax = axes[2, col]
        ax.plot(cov["true"], cov["est"], ".", markersize=2, alpha=0.4)
        lo = min(cov["true"].min(), cov["est"].min())
        hi = max(cov["true"].max(), cov["est"].max())
        ax.plot([lo, hi], [lo, hi], "k-", lw=1)
        if col == 0:
            ax.set_ylabel("sampled covariance")
        ax.set_xlabel("limit covariance")

    fig.tight_layout()
    fig.savefig(out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(f"Usage: {sys.argv[0]} csv_dir out_path")
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
