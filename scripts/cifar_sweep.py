"""CIFAR Gram tile-size sweep: settle round-4 VERDICT item 6.

The global tile size 128 was fixed by a round-1 sweep on MNIST-shaped
(28x28x1) workloads; the CIFAR-10 config's geometry (32x32x3, and its
own declared ``kernel_batch_size=350``, reference: configs/cifar10.py:8)
was never re-swept, and `bench.py` reports cifar10 at ~0.49 VPU
utilisation vs 0.75 for the ConvNet GP.  This script measures steady-state
Gram throughput for the cifar10 config across tile sizes (including a
lane-aligned stand-in for the config's 350) with the same marginal-cost
protocol as bench.py (two dispatch windows + sync fetch, median of
samples), plus XLA's FLOP estimate per tile program, so the outcome is
either a measured better default or a written no-go.

    python -m scripts.cifar_sweep --tiles=64,128,192,256,352
"""

import json
import time

import absl.app
import absl.flags
import numpy as np

FLAGS = absl.flags.FLAGS


def measure(config_name: str, b: int, n1: int, n2: int, samples: int):
    import jax
    import configs
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.parallel.gram import _tile_jit

    config = configs.load(config_name)
    model = config.initial_model
    shape = configs.image_shape(config)
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.rand(b * 4, *shape).astype(np.float32))
    snap = settings.snapshot()

    @jax.jit
    def _sync_sum(rs):
        return sum(r[0, 0] for r in rs)

    def run(n):
        t0 = time.perf_counter()
        rs = [_tile_jit(model, x, x, b * (k % 4), b * ((k * 7 + 1) % 4),
                        b, True, snap) for k in range(n)]
        np.asarray(_sync_sum(rs))
        return time.perf_counter() - t0

    for _ in range(2):
        run(1)
    flops = None
    try:
        cost = jax.jit(
            lambda a, i, j: _tile_jit(model, a, a, i, j, b, True, snap)
        ).lower(x, 0, b).compile().cost_analysis()
        if cost and cost.get("flops"):
            flops = float(cost["flops"])
    except Exception:
        pass
    per_tile = []
    for _ in range(samples * 2):
        m = (run(n2) - run(n1)) / (n2 - n1)
        if m > 0:
            per_tile.append(m)
        if len(per_tile) >= samples:
            break
    if not per_tile:
        return None
    med = float(np.median(per_tile))
    return {"tile": b, "entries_per_s": round(b * b / med, 1),
            "ms_per_tile": round(med * 1e3, 2),
            "xla_tflops_per_s": (round(flops / med / 1e12, 3)
                                 if flops else None),
            "vpu_util_vs_4e12": (round(flops / med / 4e12, 3)
                                 if flops else None),
            "n_samples": len(per_tile)}


def main(_):
    rows = []
    for b in [int(t) for t in FLAGS.tiles.split(",")]:
        r = measure(FLAGS.config, b, FLAGS.n1, FLAGS.n2, FLAGS.samples)
        print(json.dumps(r), flush=True)
        if r:
            rows.append(r)
    if rows:
        best = max(rows, key=lambda r: r["entries_per_s"])
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    absl.flags.DEFINE_string("config", "cifar10", "config to sweep")
    absl.flags.DEFINE_string("tiles", "64,128,192,256,352",
                             "comma list of tile sizes (352 = the "
                             "config's 350 hint rounded to the 32-lane "
                             "grid)")
    absl.flags.DEFINE_integer("n1", 4, "short marginal window (tiles)")
    absl.flags.DEFINE_integer("n2", 16, "long marginal window (tiles)")
    absl.flags.DEFINE_integer("samples", 3, "positive samples per size")
    absl.app.run(main)
