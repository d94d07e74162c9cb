"""Headline benchmark: ResNet-32 GP Gram throughput (entries/sec/chip).

Measures steady-state Gram tile computation for the flagship `mnist_as_tf`
ResNet-32 NNGP on synthetic MNIST-shaped data (throughput is independent of
pixel values), batch 200x200 tiles -- the reference's default unit of work
(reference: exp_mnist_resnet/save_kernel.py:43-45).

Timing protocol: the tunneled TPU platform acknowledges dispatches
asynchronously and `block_until_ready` may return before remote execution
finishes, so we time the *marginal* cost -- (time of N2 dispatches + one
fetch) - (time of N1 dispatches + one fetch) over (N2 - N1) tiles -- which
cancels both compile and round-trip latency.

`vs_baseline` compares against the reference implementation executing the
same workload (see BASELINE.md: the reference publishes no throughput
numbers, so the baseline is our measurement of the reference's PyTorch
code on this container's CPU: 1,413 entries/s, single-thread torch 2.13).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "entries/s/chip", "vs_baseline": N}
"""

import json
import signal
import time

import numpy as np

# Reference (torch CPU, single thread) measured on this container:
# 32x32 mnist_as_tf tile in 725 ms => 1,413 entries/s.  See BASELINE.md.
REFERENCE_ENTRIES_PER_SEC = 1413.0

BATCH = 128  # autotuned: pair dim 128*128 aligns with the lane width (BASELINE.md)
N_WARM = 2
N1, N2 = 6, 18


class _Watchdog:
    """Abort a stalled attempt (the tunneled TPU runtime occasionally hangs
    for minutes) so a retry can still produce the JSON line."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        def _raise(signum, frame):
            raise TimeoutError(f"bench attempt stalled > {self.seconds}s")
        self._old = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def _measure():
    import jax
    import configs
    from cnn_gp_tpu import settings
    from cnn_gp_tpu.parallel.gram import _tile_jit

    model = configs.load("mnist_as_tf").initial_model
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.rand(BATCH * 4, 1, 28, 28).astype(np.float32))
    snap = settings.snapshot()

    def run(n):
        t0 = time.perf_counter()
        r = None
        for k in range(n):
            r = _tile_jit(model, x, x, BATCH * (k % 4),
                          BATCH * ((k * 7 + 1) % 4), BATCH, True, snap)
        np.asarray(r)  # fetch forces full sync on tunneled platforms
        return time.perf_counter() - t0

    for _ in range(N_WARM):
        run(1)
    t1 = run(N1)
    t2 = run(N2)
    per_tile = (t2 - t1) / (N2 - N1)
    return BATCH * BATCH / per_tile


def main():
    value = None
    for attempt, budget in enumerate((420, 420, 600)):
        try:
            with _Watchdog(budget):
                value = _measure()
            break
        except TimeoutError as e:
            import sys
            print(f"bench attempt {attempt}: {e}", file=sys.stderr,
                  flush=True)
    if value is None:
        raise SystemExit("bench: all attempts stalled")
    print(json.dumps({
        "metric": "gram_entries_per_sec_per_chip_resnet32_gp",
        "value": round(value, 1),
        "unit": "entries/s/chip",
        "vs_baseline": round(value / REFERENCE_ENTRIES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
