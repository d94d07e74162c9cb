"""End-to-end parity: the CLI pipeline's persisted Gram must match the
torch reference evaluated on the same images (the strongest integration
gate: IDX loading -> config model -> tiled assembly -> HDF5 -> reload)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import ref_forward

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pipeline_kxx_matches_reference(ref_kernels, tmp_path):
    from scripts.make_fake_dataset import make_mnist
    import configs
    from cnn_gp_tpu.data import DatasetFromConfig, GramStore

    make_mnist(str(tmp_path), n_train=64, n_test=16)

    # a small config file using the paper ConvNet GP on a 48/8/16 split
    cfg_path = os.path.join(REPO, "configs", "_test_e2e_tmp.py")
    with open(cfg_path, "w") as f:
        f.write(
            "from configs.mnist_paper_convnet_gp import (dataset_name, "
            "transforms, in_channels, out_channels, initial_model)\n"
            "train_range = range(0, 48)\n"
            "validation_range = range(48, 56)\n"
            "test_range = range(64, 80)\n")
    try:
        out = str(tmp_path / "k.h5")
        r = subprocess.run(
            [sys.executable, "-m", "exp_mnist_resnet.save_kernel",
             "--config=_test_e2e_tmp", f"--datasets_path={tmp_path}",
             "--batch_size=20", f"--out_path={out}"],
            cwd=REPO, capture_output=True, text=True, timeout=600,
            env=dict(os.environ))
        assert r.returncode == 0, r.stderr[-2000:]

        cfg = configs.load("_test_e2e_tmp")
        ds = DatasetFromConfig(str(tmp_path), cfg)
        with GramStore(out, "r") as store:
            kxx = store.read("Kxx")
            kxtx = store.read("Kxtx")

        # torch reference on the same images
        R = ref_kernels
        var_bias, var_weight = 7.86, 2.79
        layers = []
        for _ in range(7):
            layers += [R.Conv2d(kernel_size=7, padding="same",
                                var_weight=var_weight * 49,
                                var_bias=var_bias), R.ReLU()]
        ref_m = R.Sequential(*layers,
                             R.Conv2d(kernel_size=28, padding=0,
                                      var_weight=var_weight,
                                      var_bias=var_bias))
        want_kxx = ref_forward(ref_m, ds.train.images)
        scale = np.abs(want_kxx).max()
        iu = np.triu_indices(48)
        assert np.abs(kxx[iu] - want_kxx[iu]).max() / scale < 1e-5

        want_kxtx = ref_forward(ref_m, ds.test.images, ds.train.images,
                                same=False)
        assert np.abs(kxtx - want_kxtx).max() / scale < 1e-5
    finally:
        os.remove(cfg_path)
