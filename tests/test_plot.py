"""Convergence-figure plotter test: CSVs in, 3x4 PDF out."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_csvs(d):
    rng = np.random.RandomState(0)
    for c in (3, 10, 30, 100):
        pd.DataFrame({"r0": rng.randn(500)}).to_csv(
            os.path.join(d, f"{c:04d}_0001_samples.csv"), index=False)
        n = 20
        i = np.repeat(np.arange(n), n).astype(float)
        j = np.tile(np.arange(n), n).astype(float)
        true = rng.rand(n * n)
        est = true + 0.05 * rng.randn(n * n)
        pd.DataFrame({"i": i, "j": j, "est": est, "true": true}).to_csv(
            os.path.join(d, f"{c:04d}_0001_cov.csv"), index=False)


def test_random_plot_produces_figure(tmp_path):
    _fake_csvs(str(tmp_path))
    out = str(tmp_path / "fig.pdf")
    r = subprocess.run(
        [sys.executable, "-m", "exp_random_nn.random_plot",
         str(tmp_path), out],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.getsize(out) > 5000
