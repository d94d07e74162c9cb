"""Posterior-serving throughput on the real chip.

Measures what a deployed `GPPredictor` (cnn_gp_tpu.serving) sustains:
mean-prediction queries/s and variance queries/s against an N-point
training set, via the bounded tile-regeneration sweeps (nothing O(N^2)
resident, O(len(z)) fetched per query batch).

The reference has no serving story at all — its only persisted artifact
is the O(N^2) Gram HDF5 and every prediction process re-pays the full
float64 host solve (reference: exp_mnist_resnet/classify_gp.py:17-27,
~45 min at N=50k on this host) before it can answer a single query.

Protocol: solve once with `classify_device_large` (or load a saved
posterior artifact via --posterior), then time `classify(z)` /
`variances(z)` over --rounds batches of --query_batch fresh queries.
Every timed call ends in a host fetch (the scores/variances arrays), so
walls are honest on the tunneled runtime where `block_until_ready` does
not sync remote execution (CLAUDE.md).  The first call of each kind is
excluded as compile; reported throughput is the median of the rounds.
"""

import json
import time

import absl.app
import absl.flags
import numpy as np

FLAGS = absl.flags.FLAGS


def _median_rate(fn, make_z, rounds, batch):
    """(median q/s, per-round q/s list, latency percentiles dict).

    Latency is per-BATCH wall (submit -> scores fetched), the number a
    serving SLO is written against; p50/p99 are interpolated over the
    measured rounds (with few rounds p99 degrades toward the max — raise
    --rounds for tail resolution)."""
    fn(make_z(0))                       # warm: compile + upload
    rates, lats = [], []
    for r in range(1, rounds + 1):
        z = make_z(r)
        t0 = time.perf_counter()
        out = fn(z)
        dt = time.perf_counter() - t0
        assert np.asarray(out).shape[0] == batch
        rates.append(batch / dt)
        lats.append(dt)
    lat_ms = np.asarray(lats) * 1e3
    pct = {"p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
           "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
           "max_ms": round(float(lat_ms.max()), 1)}
    return float(np.median(rates)), rates, pct


def main(argv):
    del argv
    import configs
    from cnn_gp_tpu.data import synthetic_arrays
    from cnn_gp_tpu.serving import GPPredictor, Posterior, load_posterior

    config = configs.load(FLAGS.config)
    model = config.initial_model
    shape = configs.image_shape(config)
    rng = np.random.RandomState(FLAGS.seed + 1)

    if FLAGS.posterior:
        post = load_posterior(FLAGS.posterior)
        print(f"loaded posterior: n={post.n}")
    else:
        from cnn_gp_tpu.parallel import classify_device_large
        tr_x, tr_y, te_x, te_y = synthetic_arrays(
            n_train=FLAGS.n_train, n_test=FLAGS.query_batch, shape=shape,
            seed=FLAGS.seed)
        t0 = time.perf_counter()
        _, info = classify_device_large(
            model, tr_x, tr_y, (te_x, te_y), batch_size=FLAGS.batch_size,
            block=FLAGS.block, verbose=True)
        print(f"solved n={FLAGS.n_train} in {time.perf_counter()-t0:.1f}s "
              f"(serving would normally load this from a posterior "
              f"artifact)")
        post = Posterior(train_x=tr_x, alpha=info["alpha"],
                         scalings=info["scalings"],
                         jitter_raw=info["jitter_raw"],
                         config_name=FLAGS.config,
                         settings_snapshot=None)

    pred = GPPredictor(model, post, batch_size=FLAGS.batch_size)
    qb = FLAGS.query_batch

    def make_z(r):
        return rng.rand(qb, *shape).astype(np.float32)

    mean_qps, mean_rates, mean_lat = _median_rate(pred.classify, make_z,
                                                  FLAGS.rounds, qb)
    print(f"mean-prediction: median {mean_qps:.1f} q/s over "
          f"{FLAGS.rounds} x {qb}-query batches "
          f"({[f'{r:.1f}' for r in mean_rates]}) latency {mean_lat}")

    var_qps = var_lat = prep = None
    if FLAGS.variances:
        t0 = time.perf_counter()
        pred.prepare_variances(block=FLAGS.block,
                               factor_cache=FLAGS.factor_cache or None)
        prep = time.perf_counter() - t0
        print(f"prepare_variances"
              f"{' (factor_cache)' if FLAGS.factor_cache else ''}: "
              f"{prep:.1f}s")
        var_qps, var_rates, var_lat = _median_rate(pred.variances, make_z,
                                                   FLAGS.rounds, qb)
        print(f"variances: median {var_qps:.1f} q/s "
              f"({[f'{r:.1f}' for r in var_rates]}) latency {var_lat}")

    print(json.dumps({
        "n_train": post.n, "config": FLAGS.config,
        "query_batch": qb, "rounds": FLAGS.rounds,
        "mean_queries_per_s": round(mean_qps, 2),
        "mean_batch_latency": mean_lat,
        "variance_queries_per_s": (round(var_qps, 2)
                                   if var_qps is not None else None),
        "variance_batch_latency": var_lat,
        "prepare_variances_s": (round(prep, 1) if prep is not None
                                else None),
    }))


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("config", "mnist_as_tf", "config name from `configs`")
    f.DEFINE_string("posterior", "", "serve this saved posterior artifact "
                    "instead of solving a synthetic one")
    f.DEFINE_integer("n_train", 16384, "training-set size when solving")
    f.DEFINE_integer("batch_size", 128, "Gram tile size")
    f.DEFINE_integer("block", 2048, "factor block size")
    f.DEFINE_integer("query_batch", 256, "queries per timed batch")
    f.DEFINE_integer("rounds", 20, "timed batches per measurement (p99 "
                     "latency resolution improves with more rounds)")
    f.DEFINE_string("factor_cache", "", "opt-in on-disk factor cache "
                    "directory (an O(N^2) file) for prepare_variances — "
                    "see GPPredictor.prepare_variances for when it wins")
    f.DEFINE_integer("seed", 0, "synthetic data seed")
    f.DEFINE_boolean("variances", True,
                     "also measure variance-query throughput (needs the "
                     "solve-free factor rebuild first)")
    absl.app.run(main)
