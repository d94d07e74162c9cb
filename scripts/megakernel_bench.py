"""Measure the whole-network fused Pallas megakernel vs the XLA path.

Settles round-1 VERDICT #5 with numbers: same ConvNet-GP Gram tile, same
marginal-cost protocol as bench.py, plus XLA's own FLOP estimates.
Result table lives in BASELINE.md ("Megakernel verdict").

    python -m scripts.megakernel_bench [--batch=128] [--rows=8]
"""

import time

import absl.app
import absl.flags
import numpy as np

FLAGS = absl.flags.FLAGS
N_WARM, N1, N2 = 2, 6, 18


def _marginal(fn, fetch):
    for _ in range(N_WARM):
        fetch(fn(0))

    def run(n):
        t0 = time.perf_counter()
        r = None
        for k in range(n):
            r = fn(k)
        fetch(r)
        return time.perf_counter() - t0

    t1, t2 = run(N1), run(N2)
    return (t2 - t1) / (N2 - N1)


def main(_):
    import jax
    import configs
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.ops import megakernel
    from cnn_gp_tpu.parallel.gram import _tile_jit

    b = FLAGS.batch
    model = configs.load("mnist_paper_convnet_gp").initial_model
    spec = megakernel.match(model)
    assert spec is not None
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.rand(b * 4, 1, 28, 28).astype(np.float32))
    snap = settings.snapshot()
    print(f"backend: {jax.default_backend()}  batch={b} "
          f"rows_per_step={FLAGS.rows}")

    # numerical agreement on-device first
    xa = x[:b]
    want = np.asarray(_tile_jit(model, x, x, 0, b, b, True, snap))
    got = np.asarray(megakernel.gram_tile(
        spec, xa, x[b:2 * b], None, rows_per_step=FLAGS.rows))
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"on-device rel diff vs XLA path: {rel:.2e}")

    t_xla = _marginal(
        lambda k: _tile_jit(model, x, x, b * (k % 4), b * ((k * 7 + 1) % 4),
                            b, True, snap),
        np.asarray)
    print(f"xla path:   {t_xla * 1e3:8.3f} ms/tile  "
          f"{b * b / t_xla / 1e6:6.2f}M entries/s")

    xt = [jax.device_put(np.ascontiguousarray(
        np.asarray(x[i * b:(i + 1) * b]))) for i in range(4)]
    t_mk = _marginal(
        lambda k: megakernel.gram_tile(spec, xt[k % 4], xt[(k * 7 + 1) % 4],
                                       None, rows_per_step=FLAGS.rows),
        np.asarray)
    print(f"megakernel: {t_mk * 1e3:8.3f} ms/tile  "
          f"{b * b / t_mk / 1e6:6.2f}M entries/s")
    print(f"speedup: {t_xla / t_mk:.2f}x")


if __name__ == "__main__":
    absl.flags.DEFINE_integer("batch", 128, "tile size")
    absl.flags.DEFINE_integer("rows", 16, "megakernel rows per grid step (16 measured best)")
    absl.app.run(main)
