"""End-to-end pipeline test through the real CLI drivers: save_kernel ->
merge -> classify on the synthetic config (the reference's run.bash flow,
reference: exp_mnist_resnet/run.bash:21-49)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, **env):
    e = dict(os.environ)
    e.update(env)
    return subprocess.run([sys.executable, "-m", *args], cwd=REPO,
                          capture_output=True, text=True, env=e, timeout=600)


@pytest.mark.slow
def test_full_pipeline_synthetic(tmp_path):
    out0 = str(tmp_path / "00_nw02.h5")
    out1 = str(tmp_path / "01_nw02.h5")
    common = ["--config=synthetic", f"--datasets_path={tmp_path}",
              "--batch_size=128"]
    for rank, path in [(0, out0), (1, out1)]:
        r = run(["exp_mnist_resnet.save_kernel", *common,
                 "--n_workers=2", f"--worker_rank={rank}",
                 f"--out_path={path}"])
        assert r.returncode == 0, r.stderr[-2000:]

    r = run(["exp_mnist_resnet.merge_h5_files", out0, out1])
    assert r.returncode == 0, r.stderr[-2000:]

    r = run(["exp_mnist_resnet.classify_gp", "--config=synthetic",
             f"--datasets_path={tmp_path}", f"--in_path={out0}",
             "--jitter=1e-6", "--solver=chol_ir"])
    assert r.returncode == 0, r.stderr[-2000:]
    accs = {}
    for line in r.stdout.splitlines():
        if "accuracy:" in line:
            key = line.split()[0]
            accs[key] = float(line.split(":")[1].strip().rstrip("%"))
    assert accs, r.stdout
    # synthetic prototype task is nearly separable
    assert accs["validation"] > 90.0, accs
    assert accs["test"] > 90.0, accs


@pytest.mark.slow
def test_pipeline_zarr_backend_shared_store(tmp_path):
    """Two workers write ONE shared zarr store concurrently -- no merge
    step -- then classify straight from it."""
    store = str(tmp_path / "grams.zarr")
    common = ["--config=synthetic", f"--datasets_path={tmp_path}",
              "--batch_size=128", f"--out_path={store}"]
    import subprocess
    procs = [subprocess.Popen(
        [sys.executable, "-m", "exp_mnist_resnet.save_kernel", *common,
         "--n_workers=2", f"--worker_rank={rank}"],
        cwd=REPO, env=dict(os.environ), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for rank in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:]

    r = run(["exp_mnist_resnet.classify_gp", "--config=synthetic",
             f"--datasets_path={tmp_path}", f"--in_path={store}",
             "--jitter=1e-6", "--solver=chol_ir"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "test accuracy" in r.stdout


@pytest.mark.slow
def test_random_comparison_driver(tmp_path):
    r = run(["exp_random_nn.random_comparison", "--config=synthetic",
             f"--datasets_path={tmp_path}", f"--out_path={tmp_path}",
             "--channels=16", "--n_samples=200", "--seed=1"])
    assert r.returncode == 0, r.stderr[-2000:]
    import pandas as pd
    cov = pd.read_csv(tmp_path / "0016_0001_cov.csv")
    assert {"i", "j", "est", "true"} <= set(cov.columns)
    # loose agreement even at 200 samples / width 16
    corr = np.corrcoef(cov["est"], cov["true"])[0, 1]
    assert corr > 0.5, corr


@pytest.mark.slow
def test_classify_e2e_large_cli(tmp_path):
    """The one-shot device-resident driver (classify_e2e --large): both
    splits classified, residual and GP evidence reported (this CLI has no
    store dependency -- the synthetic config is dataset-free)."""
    r = run(["exp_mnist_resnet.classify_e2e", "--config=synthetic",
             f"--datasets_path={tmp_path}", "--batch_size=32",
             "--block=64", "--large"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "validation accuracy:" in r.stdout, r.stdout
    assert "test accuracy:" in r.stdout, r.stdout
    assert "log evidence" in r.stdout, r.stdout
    assert "nan" not in r.stdout and "inf" not in r.stdout, r.stdout


@pytest.mark.slow
def test_serve_posterior_cli(tmp_path):
    """Train-once/serve-forever through the real CLIs: classify_e2e
    --large --save_posterior writes the O(N) artifact, serve_gp then
    reproduces the same split accuracies (and variance summaries) WITHOUT
    re-solving — the reference re-runs its O(N^3) solve per process."""
    post = str(tmp_path / "posterior.npz")
    r = run(["exp_mnist_resnet.classify_e2e", "--config=synthetic",
             f"--datasets_path={tmp_path}", "--batch_size=32",
             "--block=64", "--large", f"--save_posterior={post}"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "posterior saved" in r.stdout, r.stdout
    solve_accs = [line for line in r.stdout.splitlines()
                  if "accuracy:" in line]

    cache = str(tmp_path / "fcache")
    r2 = run(["exp_mnist_resnet.serve_gp", "--config=synthetic",
              f"--datasets_path={tmp_path}", f"--posterior={post}",
              "--batch_size=32", "--block=64", "--variances",
              f"--factor_cache={cache}"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "variance factor ready (no solve" in r2.stdout, r2.stdout
    assert "predictive std" in r2.stdout, r2.stdout
    # identical accuracies (same tile size => identical float32 sweeps)
    for line in solve_accs:
        split, acc = line.split(" accuracy: ")
        assert f"{split} accuracy: {acc}" in r2.stdout, (line, r2.stdout)

    # a fresh process loads the written factor cache instead of
    # reassembling, and serves the same std summaries
    import os
    assert os.path.exists(os.path.join(cache, "l.npy"))
    r2b = run(["exp_mnist_resnet.serve_gp", "--config=synthetic",
               f"--datasets_path={tmp_path}", f"--posterior={post}",
               "--batch_size=32", "--block=64", "--variances",
               f"--factor_cache={cache}"])
    assert r2b.returncode == 0, r2b.stderr[-2000:]
    stds = [ln.rsplit("  (", 1)[0] for ln in r2.stdout.splitlines()
            if "predictive std" in ln]
    for ln in stds:
        assert ln in r2b.stdout, (ln, r2b.stdout)

    # a mismatched --config would serve a different kernel => refused
    r3 = run(["exp_mnist_resnet.serve_gp", "--config=mnist",
              f"--datasets_path={tmp_path}", f"--posterior={post}"])
    assert r3.returncode != 0
    assert "solved under config" in (r3.stdout + r3.stderr)


@pytest.mark.slow
def test_classify_gp_variances_and_evidence(tmp_path):
    """`classify_gp --variances` (round-3 VERDICT #8): the checkpointed
    store pipeline reports predictive-std summaries + train evidence from
    the stored Kv_diag/Kt_diag, under both the float64 scipy path and the
    float32 chol_dist factor path — and the two agree (scipy is the
    oracle; the factor path's floor is eps32 * k_zz)."""
    import re

    out = str(tmp_path / "00_nw01.h5")
    r = run(["exp_mnist_resnet.save_kernel", "--config=synthetic",
             f"--datasets_path={tmp_path}", "--batch_size=128",
             f"--out_path={out}"])
    assert r.returncode == 0, r.stderr[-2000:]

    def classify(solver):
        r = run(["exp_mnist_resnet.classify_gp", "--config=synthetic",
                 f"--datasets_path={tmp_path}", f"--in_path={out}",
                 "--jitter=1e-6", f"--solver={solver}", "--variances",
                 "--lpd"])
        assert r.returncode == 0, r.stderr[-2000:]
        stds = {m.group(1): float(m.group(2)) for m in re.finditer(
            r"(validation|test) predictive std: mean ([\d.e+-]+)",
            r.stdout)}
        ev = float(re.search(r"train log evidence: ([-\d.e+]+)",
                             r.stdout).group(1))
        lpds = {m.group(1): float(m.group(2)) for m in re.finditer(
            r"(validation|test) lpd: ([-\d.]+) \+-", r.stdout)}
        assert set(stds) == {"validation", "test"}, r.stdout
        assert set(lpds) == {"validation", "test"}, r.stdout
        assert all(v > 0 for v in stds.values()), stds
        return stds, ev, lpds

    stds_sp, ev_sp, lpd_sp = classify("scipy")
    stds_cd, ev_cd, lpd_cd = classify("chol_dist")
    for k in stds_sp:
        assert abs(stds_cd[k] - stds_sp[k]) < 2e-2 * stds_sp[k], (
            k, stds_cd[k], stds_sp[k])
    assert abs(ev_cd - ev_sp) < 1e-3 * abs(ev_sp), (ev_cd, ev_sp)
    # float32-factor LPD agrees with the f64 scipy path
    for k in lpd_sp:
        assert abs(lpd_cd[k] - lpd_sp[k]) < max(
            2e-2 * abs(lpd_sp[k]), 0.5), (k, lpd_cd[k], lpd_sp[k])

    # and the scipy path matches a direct f64 oracle recomputation from
    # the SAME stored arrays (absolute-jitter convention of the CLI)
    import configs
    from cnn_gp_tpu.data import DatasetFromConfig, open_store
    from cnn_gp_tpu.ops import solve
    config = configs.load("synthetic")
    dataset = DatasetFromConfig(str(tmp_path), config)
    _, ytr = DatasetFromConfig.load_full(dataset.train)
    _, yv = DatasetFromConfig.load_full(dataset.validation)
    with open_store(out, "r") as f:
        kxx = solve.symmetrize_from_upper(f.read("Kxx", dtype=np.float64))
        kxvx = f.read("Kxvx")
        kv_diag = f.read("Kv_diag")
    stats = solve.solve_gp_stats(kxx, solve.one_hot_targets(ytr),
                                 jitter=1e-6,
                                 splits=[(kxvx, kv_diag)])
    scores = np.asarray(kxvx, np.float64) @ stats["alpha"]
    want, _, _ = solve.gaussian_lpd(scores, stats["variances"][0], yv,
                                    noise=1e-6)
    assert abs(lpd_sp["validation"] - want) < max(1e-3 * abs(want), 1e-3), (
        lpd_sp["validation"], want)


def test_classify_gp_variances_solver_guard(tmp_path):
    r = run(["exp_mnist_resnet.classify_gp", "--config=synthetic",
             f"--datasets_path={tmp_path}", "--in_path=/nonexistent",
             "--solver=chol_ir", "--variances"])
    assert r.returncode != 0
    assert "factor to whiten against" in (r.stderr + r.stdout)
