"""Multi-host wiring.

The reference coordinates workers entirely via flags + a shared filesystem
(reference: cnn_gp/data.py:11-19, run.bash:27-43).  On a TPU fleet the
native equivalent is ``jax.distributed``: each host initialises the
runtime, derives its worker identity from the process index, and the
existing contiguous-span tile partition (parallel/scheduler.py) plus the
NaN-merge store give cross-host assembly with no other communication.
Within each host, the local mesh shards its span further via shard_map.

Launch recipe (wired into exp_mnist_resnet/save_kernel.py; tested by
tests/test_multihost.py with a real 2-process fleet):

    # TPU pod (topology auto-discovered):
    python -m exp_mnist_resnet.save_kernel --coordinator_address=$COORD ...
    # CPU / explicit fleets, one line per host:
    python -m exp_mnist_resnet.save_kernel \
        --coordinator_address=host0:12345 --num_processes=4 --process_id=$I \
        --out_path=out/$(printf %02d $I)_nw04.h5 ...
    # then merge shards + classify exactly as run.bash does.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

__all__ = ["initialize", "worker_identity"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise the JAX distributed runtime (no-op if single-process).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly elsewhere (e.g. CPU fleets).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def worker_identity() -> Tuple[int, int]:
    """(worker_rank, n_workers) for the tile partition, from the process
    topology.  Single-process => (0, 1), matching the reference flags'
    defaults (reference: exp_mnist_resnet/save_kernel.py:47-48)."""
    return jax.process_index(), jax.process_count()
