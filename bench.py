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
of up to 5 (>=3) positive marginal samples: a tunnel stall inside the short (N1)
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

Stall handling is per-SAMPLE (round-3 VERDICT #7): each worker STREAMS a
JSON line per completed marginal sample, so when the parent's watchdog
kills a stalled worker the already-measured samples survive and a fresh
worker tops the count up — a stall costs one sample, never a whole
attempt.  The JSON reports per-workload sample spread (min/median/max
entries/s) alongside the median so drift inside the floor-to-ceiling band
is visible.

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
N_SAMPLES = 5   # per workload when the tunnel is healthy (round-4 VERDICT
# #7: 3 left the spread dominated by single tunnel artifacts)
# a positive sample further than this factor from the workload median is a
# tunnel artifact (mild stall in one window), not kernel drift: measured
# kernel drift is +-6% across rounds, measured stall artifacts are 2-3x
# (BENCH_r04.json convnet min 3.83M vs median 10.78M)
STALL_RATIO = 1.35
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


def _measure(config_name, needed: int):
    """Worker body: STREAM each marginal sample to stdout as its own
    flushed JSON line the moment it completes (plus one ``flops`` line).

    Streaming is the per-sample stall protection (round-3 VERDICT #7):
    a tunnel hang blocks in C where no in-process watchdog fires, so the
    parent's only weapon is killing this whole process — and with a
    single end-of-run result line, that kill used to eat every sample
    the attempt had already measured (BENCH_r03.json attempt 0 lost a
    whole 420s budget to one stall).  With streaming, a kill costs only
    the in-flight sample; the parent keeps the rest and relaunches a
    fresh worker to top the count up."""
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

    # XLA's own FLOP estimate for the compiled tile program -- emitted
    # FIRST so a later stall cannot eat it
    try:
        lowered = jax.jit(
            lambda a, i, j: _tile_jit(model, a, a, i, j, BATCH, True, snap)
        ).lower(x, 0, BATCH)
        cost = lowered.compile().cost_analysis()
        if cost and cost.get("flops"):
            print(json.dumps({"flops": float(cost["flops"])}), flush=True)
    except Exception:
        pass

    got = 0
    for _ in range(8):
        t1 = run(N1)
        t2 = run(N2)
        m = (t2 - t1) / (N2 - N1)
        # negative marginal = severe stall inside the short window;
        # report it (the parent discards but logs) and keep sampling
        print(json.dumps({"sample": m}), flush=True)
        if m > 0:
            got += 1
        if got >= needed:
            break


def _collect_samples(name, budget, needed):
    """Run one killable worker attempt; return (samples, flops) parsed
    from whatever it managed to STREAM before finishing or being killed.
    The tunnel can hang mid-measurement (after a successful probe),
    blocked in C where an in-process SIGALRM watchdog never fires — only
    a subprocess kill bounds that, and streaming means the kill costs
    only the in-flight sample."""
    stdout = ""
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--worker", name, str(needed)],
                           timeout=budget, capture_output=True, text=True)
        stdout = r.stdout or ""
        if r.stderr:
            sys.stderr.write(r.stderr)
            sys.stderr.flush()
        if r.returncode != 0:
            print(f"bench[{name}]: worker exited {r.returncode}",
                  file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired as e:
        # keep the streamed samples; forward the partial stderr -- it is
        # the only evidence distinguishing a tunnel outage from a hang
        stdout = (e.stdout if isinstance(e.stdout, str)
                  else (e.stdout or b"").decode(errors="replace"))
        err = (e.stderr if isinstance(e.stderr, str)
               else (e.stderr or b"").decode(errors="replace"))
        if err:
            sys.stderr.write(err)
            sys.stderr.flush()
        print(f"bench[{name}]: attempt killed at {budget}s; keeping "
              f"streamed samples", file=sys.stderr, flush=True)
    samples, flops = [], None
    for line in stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "sample" in d:
            if d["sample"] > 0:
                samples.append(float(d["sample"]))
            else:
                print(f"bench[{name}]: discarding negative sample "
                      f"{d['sample']:.4f}s (stall in the short window)",
                      file=sys.stderr, flush=True)
        if "flops" in d:
            flops = float(d["flops"])
    return samples, flops


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
        # samples ACCUMULATE across attempts (each worker streams them as
        # they complete), so a mid-attempt stall costs one sample, never
        # the attempt — round-3 VERDICT #7; BENCH_r03.json attempt 0 lost
        # a whole 420s budget to one stall under the old all-or-nothing
        # scheme
        samples, flops = [], None
        for attempt, budget in enumerate((300, 300, 420)):
            try:
                got, fl = _collect_samples(name, budget,
                                           N_SAMPLES - len(samples))
                samples.extend(got)
                flops = flops or fl
                if len(samples) >= N_SAMPLES:
                    break
            # a dropped remote-compile channel surfaces as an exception
            # here; a failing secondary workload must degrade to a
            # partial breakdown, not discard the headline JSON line
            except Exception as e:
                print(f"bench[{name}] attempt {attempt}: {type(e).__name__}:"
                      f" {e}", file=sys.stderr, flush=True)
        if samples:
            per_tile = float(np.median(samples))
            # spread over INLIERS only: a positive sample >STALL_RATIO
            # away from the median is a tunnel artifact (mild stall in
            # one marginal window), counted separately so the min/max
            # band reflects kernel drift, not outages (round-4 VERDICT
            # #7; the median itself is already robust to them)
            inliers = [s for s in samples
                       if per_tile / STALL_RATIO <= s
                       <= per_tile * STALL_RATIO]
            if len(inliers) < 2:          # pathological: keep everything
                inliers = samples
            results[name] = (BATCH * BATCH / per_tile, per_tile, flops,
                             len(samples), inliers,
                             len(samples) - len(inliers))
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
    for name, (_, per_tile, flops, _, _, _) in results.items():
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
        # sample spread in entries/s (min/median/max) over INLIER samples
        # (within STALL_RATIO of the median): kernel drift is visible,
        # tunnel artifacts are counted in stall_discarded instead of
        # polluting the band (round-4 VERDICT #7)
        "spread_entries_per_s": {
            name: {"min": round(BATCH * BATCH / max(r[4]), 1),
                   "median": round(r[0], 1),
                   "max": round(BATCH * BATCH / min(r[4]), 1)}
            for name, r in results.items()},
        "stall_discarded": {name: r[5] for name, r in results.items()},
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
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        # child mode (one workload, parent enforces the timeout): stream
        # one JSON line per completed sample + one flops line
        needed = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        _measure(WORKLOADS[sys.argv[2]], max(1, needed))
    else:
        main()
