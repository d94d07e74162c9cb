"""Coverage for utility paths: settings override, timing format,
profiler annotate, merge of reference-format files (no bitmaps)."""

import numpy as np

from cnn_gp_tpu import settings
from cnn_gp_tpu.data import GramStore, merge_stores
from cnn_gp_tpu.utils import hhmmss, print_timings, round_up_div
from cnn_gp_tpu.utils.profiling import annotate


def test_settings_override_restores():
    old = settings.conv_method
    with settings.override(conv_method="direct", acos_impl="exact"):
        assert settings.conv_method == "direct"
        assert settings.acos_impl == "exact"
    assert settings.conv_method == old


def test_settings_snapshot_changes_with_override():
    a = settings.snapshot()
    with settings.override(relu_impl="reference"):
        b = settings.snapshot()
    assert a != b


def test_hhmmss():
    assert hhmmss(59) == "00:59"
    assert hhmmss(61) == "01:01"
    assert hhmmss(3661) == "01:01:01"


def test_print_timings_passthrough(capsys):
    out = list(print_timings(iter(range(5)), desc="t", print_interval=0.0,
                             total=5))
    assert out == [0, 1, 2, 3, 4]
    assert "t: " in capsys.readouterr().out


def test_round_up_div():
    assert round_up_div(10, 3) == 4
    assert round_up_div(9, 3) == 3


def test_annotate_context():
    with annotate("unit-test-span"):
        pass


def test_merge_reference_format_files(tmp_path):
    """Files without _done bitmaps (as the reference tooling writes them)
    must merge via NaN scanning."""
    import h5py
    a_path, b_path = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    for path, rows in [(a_path, range(0, 2)), (b_path, range(2, 4))]:
        with h5py.File(path, "w") as f:
            ds = f.create_dataset("Kxx", shape=(1, 4, 4), dtype=np.float32,
                                  fillvalue=np.nan, chunks=(1, 2, 2))
            for i in rows:
                ds[0, i, :] = i
    merge_stores(a_path, [b_path])
    with GramStore(a_path, "r") as store:
        merged = store.read("Kxx")
    assert not np.isnan(merged).any()
    np.testing.assert_array_equal(merged[3], np.full(4, 3.0))


def test_merge_blockwise_equals_slab(tmp_path):
    """The streamed row-block merge must be exactly the slab merge for
    every block size (incl. unaligned ones), on matrix AND diag datasets
    — the reference's slab merge peaks at ~28 GB host RAM at 50k
    (merge_h5_files.py:24-30); ours must not inherit that."""
    import h5py
    rng = np.random.RandomState(0)
    n = 50
    full = rng.rand(n, n).astype(np.float32)
    diag_full = rng.rand(n).astype(np.float32)

    def write(path, mask, dmask):
        with h5py.File(path, "w") as f:
            a = np.where(mask, full, np.nan).astype(np.float32)
            f.create_dataset("Kxx", data=a[None], chunks=(1, 8, 8))
            d = np.where(dmask, diag_full, np.nan).astype(np.float32)
            f.create_dataset("Kv_diag", data=d[None], chunks=(1, 8))

    m1 = rng.rand(n, n) < 0.5
    d1 = rng.rand(n) < 0.5
    for row_block in (1, 7, 8, 64, 10**6):
        dest = str(tmp_path / f"dest_{row_block}.h5")
        src = str(tmp_path / f"src_{row_block}.h5")
        write(dest, m1, d1)
        write(src, ~m1, ~d1)
        merge_stores(dest, [src], row_block=row_block)
        with GramStore(dest, "r") as store:
            np.testing.assert_array_equal(store.read("Kxx"), full)
            np.testing.assert_array_equal(store.read("Kv_diag"), diag_full)


def test_diag_iterator_cross_pair():
    from cnn_gp_tpu.data import DiagIterator
    x = np.zeros((10, 1, 2, 2), np.float32)
    z = np.ones((12, 1, 2, 2), np.float32)
    items = list(DiagIterator(4, x, z))
    # truncated to the shorter input, like zip in the reference
    assert sum(len(b[1][1][0]) for b in items) == 10
    assert all(not s for s, _, _ in items)


def test_probe_tpu_false_on_cpu_env():
    """On this CPU-forced test env the subprocess probe must report
    'no TPU' quickly (backend resolves to cpu, assert fails) — the exact
    gate that stops bench.py from benchmarking a CPU fallback."""
    from cnn_gp_tpu.utils import tpu_probe
    assert tpu_probe.probe_tpu(timeout_s=120) is False


def test_wait_for_tpu_budget_and_log(monkeypatch):
    from cnn_gp_tpu.utils import tpu_probe
    logs = []
    # budget exhausted: returns False, logged each failed probe
    monkeypatch.setattr(tpu_probe, "probe_tpu", lambda t, env=None: False)
    assert tpu_probe.wait_for_tpu(0.05, sleep_s=0.01,
                                  log=logs.append) is False
    assert logs and "outage" in logs[0]
    # immediate success: returns True without sleeping
    monkeypatch.setattr(tpu_probe, "probe_tpu", lambda t, env=None: True)
    assert tpu_probe.wait_for_tpu(0.05, log=logs.append) is True


def _bench_json(capsys):
    lines = capsys.readouterr().out.strip().splitlines()
    import json
    return json.loads(lines[-1])


def test_bench_outage_emits_one_json_line(monkeypatch, capsys):
    """Driver contract: bench.py prints ONE JSON line even when the
    tunnel never answers — value 0 with an explicit error flag."""
    import bench
    monkeypatch.setattr(bench, "_wait_out_outage", lambda: False)
    bench.main()
    rec = _bench_json(capsys)
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0


def test_bench_headline_stall_emits_one_json_line(monkeypatch, capsys):
    """A probe that succeeds then a mid-measurement hang on the headline
    workload (every attempt killed with NOTHING streamed) must still end
    in one honest JSON line, not SystemExit."""
    import bench
    monkeypatch.setattr(bench, "_wait_out_outage", lambda: True)
    monkeypatch.setattr(bench, "_collect_samples",
                        lambda name, budget, needed: ([], None))
    bench.main()
    rec = _bench_json(capsys)
    assert rec["error"] == "headline_workload_stalled"
    assert rec["value"] == 0.0


def test_bench_secondary_failure_degrades_to_partial(monkeypatch, capsys):
    """A failing secondary workload must not discard the headline: the
    JSON line carries the measured headline and a partial breakdown."""
    import bench
    monkeypatch.setattr(bench, "_wait_out_outage", lambda: True)
    per_tile = 128 * 128 / 5.5e6

    def collect(name, budget, needed):
        if name != "resnet32":
            raise RuntimeError("worker exited 1")
        return [per_tile] * needed, 7.5e9

    monkeypatch.setattr(bench, "_collect_samples", collect)
    bench.main()
    rec = _bench_json(capsys)
    assert "error" not in rec
    assert round(rec["value"]) == 5.5e6
    assert list(rec["breakdown"]) == ["resnet32"]
    assert "below_floor" not in rec
    spread = rec["spread_entries_per_s"]["resnet32"]
    assert spread["min"] <= spread["median"] <= spread["max"]


def test_bench_samples_accumulate_across_attempts(monkeypatch, capsys):
    """Per-sample stall protection: a killed attempt's streamed samples
    survive — the parent accumulates across attempts and never rebuys
    what it already measured (round-3 VERDICT #7)."""
    import bench
    monkeypatch.setattr(bench, "_wait_out_outage", lambda: True)
    per_tile = 128 * 128 / 6.0e6
    calls = []

    def collect(name, budget, needed):
        calls.append((name, needed))
        # every attempt yields ONE sample then "stalls"
        return [per_tile], 7.5e9

    monkeypatch.setattr(bench, "_collect_samples", collect)
    bench.main()
    rec = _bench_json(capsys)
    assert round(rec["value"]) == 6.0e6
    # N_SAMPLES=5 target, 3-attempt cap, one sample per attempt: the
    # attempt budget bounds the damage of a chronically-stalling tunnel
    assert rec["n_samples"]["resnet32"] == 3
    # each attempt asks only for what was still missing (never rebuys)
    expected = [bench.N_SAMPLES - k for k in range(3)]
    assert [n for w, n in calls if w == "resnet32"] == expected


def test_default_cache_dir_gating(monkeypatch):
    """The per-platform default compilation cache must: respect an env
    override, never touch an explicit non-default config value, key on
    the LIVE jax_platforms config, and stay OFF for pure-CPU runs (remote
    host-AOT artifacts are a SIGILL risk — cnn_gp_tpu/__init__.py)."""
    import jax
    import cnn_gp_tpu
    from cnn_gp_tpu import _apply_default_cache_dir, _CACHE_ROOT

    original = jax.config.jax_compilation_cache_dir
    try:
        # env override wins: nothing is touched
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/explicit")
        jax.config.update("jax_compilation_cache_dir", "/tmp/explicit")
        _apply_default_cache_dir()
        assert jax.config.jax_compilation_cache_dir == "/tmp/explicit"
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")

        # explicit non-default config value is preserved
        _apply_default_cache_dir()
        assert jax.config.jax_compilation_cache_dir == "/tmp/explicit"

        # cpu platform (the live config in this test env): default stays
        # off, and a stale our-default value is cleared
        assert jax.config.jax_platforms == "cpu"  # conftest forces it
        jax.config.update("jax_compilation_cache_dir", _CACHE_ROOT + "tpu")
        _apply_default_cache_dir()
        assert not jax.config.jax_compilation_cache_dir

        # platform UNRESOLVED (no config, no env): no default cache at
        # all — a 'jax-auto' key could hand CPU runs foreign host-AOT
        # artifacts (advisor finding, round 3); stale default is cleared
        platforms = jax.config.jax_platforms
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        jax.config.update("jax_platforms", None)
        try:
            jax.config.update("jax_compilation_cache_dir",
                              _CACHE_ROOT + "auto")
            _apply_default_cache_dir()
            assert not jax.config.jax_compilation_cache_dir
        finally:
            jax.config.update("jax_platforms", platforms)
    finally:
        jax.config.update("jax_compilation_cache_dir", original)


def test_conv2d_padding_spec_errors():
    """Tuple/float padding is refused with a clear message (the finite
    mirror has no asymmetric-padding counterpart), numpy ints accepted."""
    import numpy as np
    import pytest
    import cnn_gp_tpu as G
    with pytest.raises(TypeError, match="asymmetric"):
        G.Conv2d(3, padding=(1, 2))
    with pytest.raises(TypeError, match="asymmetric"):
        G.Conv2d(3, padding=1.5)
    assert G.Conv2d(3, padding=np.int64(2)).padding == 2
    assert G.Conv2d(4).pad_lo_hi == (1, 2)    # even-k "same" asymmetry
