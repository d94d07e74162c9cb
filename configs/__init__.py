"""Model/dataset config zoo.

Same two-tier config scheme as the reference (reference:
configs/mnist.py:5-15, cnn_gp/data.py:134-140, loaded by name via importlib
at exp_mnist_resnet/save_kernel.py:17): each config is a plain module with
attributes

    dataset_name     -- "MNIST" | "CIFAR10" | "synthetic"
    train_range / validation_range / test_range
                     -- index ranges into the concatenated train+test pool
    in_channels, out_channels
    transforms       -- list of callables applied PER IMAGE to [C, W, H]
                        arrays (the reference's torchvision contract,
                        cnn_gp/data.py:143-145); a callable that
                        vectorises over the whole [N, C, W, H] pool can
                        opt in with ``t.vectorized = True``
    initial_model    -- an NNGPKernel

The torchvision dataset *class* attribute is replaced by ``dataset_name``
resolution inside cnn_gp_tpu.data (no torch dependency).
"""

import importlib


def load(name: str):
    """Load a config module by name, mirroring the reference's
    ``importlib.import_module(f"configs.{name}")``."""
    return importlib.import_module(f"configs.{name}")


def image_shape(config) -> tuple:
    """[C, W, H] input shape this config's dataset produces.  The
    reference never needs this (torchvision hands it shaped data); the
    synthetic-data scale protocols (scripts/device_large_scale.py) do."""
    name = config.dataset_name
    if name == "MNIST":
        return (1, 28, 28)
    if name == "CIFAR10":
        return (3, 32, 32)
    return (config.in_channels, 28, 28)       # synthetic default
