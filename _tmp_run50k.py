import time
import numpy as np

import configs
from cnn_gp_tpu.data import synthetic_arrays
from cnn_gp_tpu.parallel import classify_device_large

model = configs.load("mnist_as_tf").initial_model
tr_x, tr_y, te_x, te_y = synthetic_arrays(
    n_train=50000, n_test=20000, shape=(1, 28, 28), seed=0)
va_x, va_y = te_x[:10000], te_y[:10000]
te_x, te_y = te_x[10000:], te_y[10000:]

t0 = time.perf_counter()
accs, info = classify_device_large(
    model, tr_x, tr_y, (va_x, va_y), (te_x, te_y),
    batch_size=128, block=2048)
wall = time.perf_counter() - t0
print("accs", accs, "wall", round(wall, 1),
      "rel", info["rel_residual"], "iters", info["refinements"],
      flush=True)
np.save("/tmp/dl50k_preds.npy", np.concatenate(info["predictions"]))
