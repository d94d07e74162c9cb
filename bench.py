"""Headline benchmark: Gram throughput (entries/sec/chip) across workloads.

Measures steady-state Gram tile computation for three workloads:

* `resnet32`   -- the flagship `mnist_as_tf` ResNet-32 NNGP on 28x28x1
  (the headline metric, same as round 1);
* `convnet_gp` -- the paper ConvNet GP (7x Conv7+ReLU) on 28x28x1;
* `cifar10`    -- the ResNet-32 CIFAR config on 32x32x3
  (reference: configs/cifar10.py).

Timing protocol: the tunneled TPU platform acknowledges dispatches
asynchronously and `block_until_ready` may return before remote execution
finishes, so we time the *marginal* cost -- (time of N2 dispatches + one
fetch) - (time of N1 dispatches + one fetch) over (N2 - N1) tiles -- which
cancels both compile and round-trip latency.  The headline is the MEDIAN
of >=3 positive marginal samples: a tunnel stall inside the short (N1)
window shrinks the difference and fakes above-steady-state throughput
(observed: an 8.4M entries/s sample on code that reproducibly measures
~5.5M), so the min-of-samples rule used through round 2 was biased fast
-- it explains the 6.06M round-1 "best" -- while a stall in the long
window fakes a slowdown; the median rejects both tails.

Alongside entries/s the script reports XLA's own FLOP estimate for the
compiled tile program (`compiled.cost_analysis()['flops']`) divided by the
measured tile time -- an achieved-compute figure the "VPU roofline" claim
can be checked against (BASELINE.md "Roofline status"), and its ratio to a
nominal 4e12 ops/s v5e VPU peak.

`vs_baseline` compares the headline metric against the reference
implementation executing the same workload (see BASELINE.md: the reference
publishes no throughput numbers, so the baseline is our measurement of the
reference's PyTorch code on this container's CPU: 1,413 entries/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "entries/s/chip", "vs_baseline": N,
   "breakdown": {...}, "flops_per_sec": {...}, "vpu_util_vs_4e12": {...}}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

from cnn_gp_tpu.utils.tpu_probe import wait_for_tpu

# Reference (torch CPU, single thread) measured on this container:
# 32x32 mnist_as_tf tile in 725 ms => 1,413 entries/s.  See BASELINE.md.
REFERENCE_ENTRIES_PER_SEC = 1413.0

BATCH = 128  # autotuned: pair dim 128*128 aligns with the lane width (BASELINE.md)
N_WARM = 2
N1, N2 = 8, 40
VPU_PEAK = 4.0e12  # nominal v5e f32 VPU ops/s (8x128 lanes x 4 ALUs x ~1GHz)
REGRESSION_FLOOR = 5.0e6  # headline entries/s below this => regression flag

# workload name -> config name; input shapes come from
# configs.image_shape() so they can't drift from the configs themselves
WORKLOADS = {
    "resnet32": "mnist_as_tf",
    "convnet_gp": "mnist_paper_convnet_gp",
    "cifar10": "cifar10",
}


def _wait_out_outage():
    """Wait out a tunnel outage (observed up to hours) within a bounded
    budget.  Returns True when the TPU answers; False when the budget is
    exhausted -- the caller then emits an explicit-failure JSON line
    instead of hanging forever or (worse, with JAX_PLATFORMS unset)
    silently benchmarking the CPU fallback as a fake perf regression."""
    if os.environ.get("BENCH_ALLOW_CPU") == "1":
        return True  # debugging escape hatch: measure whatever backend is up
    budget = float(os.environ.get("BENCH_TPU_WAIT_S", "1800"))
    return wait_for_tpu(
        budget,
        log=lambda s: print(f"bench: {s}", file=sys.stderr, flush=True))


def _measure(config_name):
    import jax
    import configs
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.parallel.gram import _tile_jit

    config = configs.load(config_name)
    model = config.initial_model
    shape = configs.image_shape(config)
    rng = np.random.RandomState(0)
    x = jax.device_put(
        rng.rand(BATCH * 4, *shape).astype(np.float32))
    snap = settings.snapshot()

    @jax.jit
    def _sync_sum(rs):
        # one scalar depending on EVERY dispatched tile: fetching it
        # bounds all of them even if the runtime overlaps independent
        # programs (fetching only the last tile does not -- measured
        # "above VPU peak" artifacts under best-of-2 timing)
        return sum(r[0, 0] for r in rs)

    def run(n):
        t0 = time.perf_counter()
        rs = [_tile_jit(model, x, x, BATCH * (k % 4),
                        BATCH * ((k * 7 + 1) % 4), BATCH, True, snap)
              for k in range(n)]
        np.asarray(_sync_sum(rs))  # fetch forces full sync
        return time.perf_counter() - t0

    for _ in range(N_WARM):
        run(1)

    def marginal():
        t1 = run(N1)
        t2 = run(N2)
        return (t2 - t1) / (N2 - N1)

    # median of >=3 positive samples (see module docstring: a stall in
    # the short window fakes speed, a stall in the long window fakes
    # slowness; min() was biased fast).  Negative samples (severe stall)
    # are discarded outright.
    samples = []
    for _ in range(8):
        m = marginal()
        if m > 0:
            samples.append(m)
        if len(samples) >= 3:
            break
    if not samples:
        raise TimeoutError("no positive marginal sample")
    n_samples = len(samples)          # <3 => the median protocol degraded
    per_tile = float(np.median(samples))

    # XLA's own FLOP estimate for the compiled tile program
    flops = None
    try:
        lowered = jax.jit(
            lambda a, i, j: _tile_jit(model, a, a, i, j, BATCH, True, snap)
        ).lower(x, 0, BATCH)
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    return BATCH * BATCH / per_tile, per_tile, flops, n_samples


def _measure_in_subprocess(name, budget):
    """One workload measurement in a killable child process.

    The tunnel can hang *mid-measurement* too (after a successful probe),
    blocked in C where an in-process SIGALRM watchdog never fires — only
    a subprocess kill bounds that.  The child is this same file in
    --worker mode; its stderr is forwarded for diagnostics."""
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--worker", name],
                           timeout=budget, capture_output=True, text=True)
    except subprocess.TimeoutExpired as e:
        # the killed worker's stderr up to the hang is the only evidence
        # distinguishing a tunnel outage from a code hang -- forward it
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
            sys.stderr.flush()
        raise
    if r.stderr:
        sys.stderr.write(r.stderr)
        sys.stderr.flush()
    if r.returncode != 0:
        raise RuntimeError(f"worker exited {r.returncode}")
    return tuple(json.loads(r.stdout.strip().splitlines()[-1]))


def main():
    if not _wait_out_outage():
        # One honest JSON line the driver can still record: the chip was
        # unreachable, not the code slow.  value=0 + explicit flag beats
        # a SystemExit (no line at all) or a CPU-fallback measurement
        # masquerading as a regression.
        print(json.dumps({
            "metric": "gram_entries_per_sec_per_chip_resnet32_gp",
            "value": 0.0,
            "unit": "entries/s/chip",
            "vs_baseline": 0.0,
            "error": "tpu_unavailable",
            "note": "axon tunnel outage outlasted BENCH_TPU_WAIT_S; "
                    "last good measurement: BENCH_r02.json / BASELINE.md",
        }))
        return
    results = {}
    for name in WORKLOADS:
        for attempt, budget in enumerate((420, 420, 600)):
            try:
                results[name] = _measure_in_subprocess(name, budget)
                break
            # the tunnel's remote-compile channel can also DROP (an
            # XlaRuntimeError in the worker, surfacing as a nonzero
            # exit), or hang mid-run (a TimeoutExpired kill); a failing
            # secondary workload must degrade to a partial breakdown, not
            # discard the already-measured headline JSON line
            except Exception as e:
                print(f"bench[{name}] attempt {attempt}: {type(e).__name__}:"
                      f" {e}", file=sys.stderr, flush=True)
        if name == "resnet32" and name not in results:
            # same contract as the pre-run outage branch: the driver is
            # promised ONE JSON line, and a tunnel that probes healthy
            # then hangs mid-measurement is still an environment failure,
            # not slow code -- record it explicitly instead of SystemExit
            print(json.dumps({
                "metric": "gram_entries_per_sec_per_chip_resnet32_gp",
                "value": 0.0,
                "unit": "entries/s/chip",
                "vs_baseline": 0.0,
                "error": "headline_workload_stalled",
                "note": "TPU probe succeeded but every headline "
                        "measurement attempt timed out or crashed; "
                        "last good measurement: BENCH_r02.json / "
                        "BASELINE.md",
            }))
            return

    value = results["resnet32"][0]
    flops_per_sec = {}
    vpu_util = {}
    for name, (_, per_tile, flops, _) in results.items():
        if flops:
            fps = flops / per_tile
            flops_per_sec[name] = round(fps / 1e12, 3)       # T ops/s
            vpu_util[name] = round(fps / VPU_PEAK, 3)
    out = {
        "metric": "gram_entries_per_sec_per_chip_resnet32_gp",
        "value": round(value, 1),
        "unit": "entries/s/chip",
        "vs_baseline": round(value / REFERENCE_ENTRIES_PER_SEC, 2),
        "breakdown": {name: round(r[0], 1) for name, r in results.items()},
        "xla_tflops_per_sec": flops_per_sec,
        "vpu_util_vs_4e12_peak": vpu_util,
        # how many positive marginal samples each median actually saw; the
        # protocol promises >=3 -- fewer means the tunnel discarded
        # samples and the figure is a degraded median, flagged explicitly
        "n_samples": {name: r[3] for name, r in results.items()},
    }
    degraded = [name for name, r in results.items() if r[3] < 3]
    if degraded:
        out["degraded_median"] = degraded
        print(f"bench: median protocol degraded (<3 positive samples) for"
              f" {degraded}", file=sys.stderr, flush=True)
    # Perf regression gate (round-2 VERDICT #4): the median-protocol
    # steady state on this code is ~5.2-5.8M entries/s; below the floor
    # is a real regression or a badly degraded runtime, not noise.
    if value < REGRESSION_FLOOR:
        out["below_floor"] = REGRESSION_FLOOR
        print(f"bench: HEADLINE {value:.0f} < floor {REGRESSION_FLOOR:.0f}"
              f" entries/s — perf regression or degraded runtime",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--worker":
        # child mode (one workload, parent enforces the timeout): print
        # the raw measurement tuple as the last stdout line
        print(json.dumps(list(_measure(WORKLOADS[sys.argv[2]]))))
    else:
        main()
