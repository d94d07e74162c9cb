"""Scaled-down mnist_as_tf for dress rehearsals: the identical ResNet-32
GP architecture on a 4k/1k/1k MNIST split.  Used to exercise the full
real-data pipeline (IDX loading, splits, multi-worker assembly, solve) in
minutes instead of the full 50k run.  Not part of the reference zoo."""

from configs.mnist_as_tf import (dataset_name, model_name, transforms,  # noqa: F401
                                 epochs, in_channels, out_channels,
                                 initial_model)

train_range = range(0, 4096)
validation_range = range(4096, 5120)
test_range = range(60000, 61024)
