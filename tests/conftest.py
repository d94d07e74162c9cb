"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the JAX-native substitute for a multi-node
test cluster).  Set CNN_GP_TPU_TEST_BACKEND=tpu to run against real
hardware instead.

The reference implementation at /root/reference (PyTorch) is used as ground
truth where available; tests depending on it skip elsewhere.
"""

import os
import sys

os.environ.setdefault("CNN_GP_TPU_TEST_BACKEND", "cpu")
if os.environ["CNN_GP_TPU_TEST_BACKEND"] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # Some environments pre-import jax at interpreter startup (e.g. a
    # sitecustomize registering a TPU plugin), which freezes env-derived
    # config before this file runs; the config API still works.
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util  # noqa: E402
import types  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def _load_reference_kernels():
    """Import the reference's torch kernel modules directly from source.

    The reference package __init__ pulls in torchvision (absent here), so
    load the two kernel modules standalone under a synthetic package.
    """
    if "ref_cnn_gp.kernels" in sys.modules:
        return sys.modules["ref_cnn_gp.kernels"]
    pkg = types.ModuleType("ref_cnn_gp")
    pkg.__path__ = [os.path.join(REFERENCE_PATH, "cnn_gp")]
    sys.modules["ref_cnn_gp"] = pkg
    for name in ["kernel_patch", "kernels"]:
        path = os.path.join(REFERENCE_PATH, "cnn_gp", f"{name}.py")
        spec = importlib.util.spec_from_file_location(
            f"ref_cnn_gp.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_cnn_gp.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_cnn_gp.kernels"]


def _reference_available():
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "cnn_gp")):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


@pytest.fixture(scope="session")
def ref_kernels():
    if not _reference_available():
        pytest.skip("reference implementation / torch not available")
    return _load_reference_kernels()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def ref_forward(ref_model, x, y=None, same=None, diag=False):
    """Run the torch reference forward, returning numpy."""
    import torch
    with torch.no_grad():
        args = [torch.from_numpy(np.asarray(x))]
        if y is not None:
            args.append(torch.from_numpy(np.asarray(y)))
            args.append(same)
        out = ref_model(*args, diag=diag)
    return out.numpy()
