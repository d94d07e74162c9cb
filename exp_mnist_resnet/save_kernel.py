"""Save a kernel matrix to disk.

CLI-compatible rebuild of the reference driver (reference:
exp_mnist_resnet/save_kernel.py:1-50): computes Kxx (train x train, upper
triangle), Kxvx (validation x train), Kxtx (test x train) sharded across
workers, and -- on rank 0 -- the Kv_diag / Kt_diag diagonals, into one HDF5
file per worker.  Same flags, same dataset names, same shard-file layout;
tile-level resume replaces skip-if-dataset-exists.

Multi-host: pass --coordinator_address (and, off TPU pods, --num_processes
/ --process_id) to join a `jax.distributed` fleet; worker_rank / n_workers
are then derived from the process topology instead of flags -- the
TPU-native replacement for the reference's rank flags + bash fan-out
(reference: exp_mnist_resnet/run.bash:27-36).
"""

import absl.app
import absl.flags

import configs
from cnn_gp_tpu.data import DatasetFromConfig, open_store
from cnn_gp_tpu.parallel import save_K
from cnn_gp_tpu.parallel import multihost

FLAGS = absl.flags.FLAGS


def main(_):
    if FLAGS.coordinator_address:
        multihost.initialize(coordinator_address=FLAGS.coordinator_address,
                             num_processes=FLAGS.num_processes,
                             process_id=FLAGS.process_id)
        worker_rank, n_workers = multihost.worker_identity()
        print(f"jax.distributed: worker {worker_rank}/{n_workers}")
    else:
        n_workers, worker_rank = FLAGS.n_workers, FLAGS.worker_rank
    config = configs.load(FLAGS.config)
    dataset = DatasetFromConfig(FLAGS.datasets_path, config)
    model = config.initial_model

    kwargs = dict(worker_rank=worker_rank, n_workers=n_workers,
                  batch_size=FLAGS.batch_size, print_interval=2.0)
    with open_store(FLAGS.out_path, "a",
                    backend=FLAGS.store_backend) as f:
        save_K(f, model, "Kxx", dataset.train, None, diag=False, **kwargs)
        save_K(f, model, "Kxvx", dataset.validation, dataset.train,
               diag=False, **kwargs)
        save_K(f, model, "Kxtx", dataset.test, dataset.train,
               diag=False, **kwargs)
        if worker_rank == 0:
            save_K(f, model, "Kv_diag", dataset.validation, None, diag=True,
                   **kwargs)
            save_K(f, model, "Kt_diag", dataset.test, None, diag=True,
                   **kwargs)


if __name__ == "__main__":
    f = absl.flags
    f.DEFINE_string("datasets_path", "/tmp/datasets",
                    "where to load datasets from")
    f.DEFINE_integer("batch_size", 200,
                     "max number of examples to simultaneously compute "
                     "the kernel of")
    f.DEFINE_string("config", "mnist", "which config to load from `configs`")
    f.DEFINE_integer("n_workers", 1, "num of workers")
    f.DEFINE_integer("worker_rank", 0, "rank of worker")
    f.DEFINE_string("out_path", None, "path of h5 file to save kernels in")
    f.DEFINE_string("store_backend", "auto",
                    "auto (by extension) | h5 | zarr (TensorStore; lets "
                    "concurrent workers write one shared store)")
    f.DEFINE_string("coordinator_address", None,
                    "host:port of the jax.distributed coordinator; when "
                    "set, worker_rank/n_workers come from the process "
                    "topology (auto-discovered on TPU pods)")
    f.DEFINE_integer("num_processes", None,
                     "process count for jax.distributed off TPU pods")
    f.DEFINE_integer("process_id", None,
                     "this process's id for jax.distributed off TPU pods")
    absl.app.run(main)
