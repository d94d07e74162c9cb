"""Production-scale rehearsal config: the mnist_as_tf ResNet-32 GP on a
16k/2k/2k MNIST split (~1/3 of the paper run).  Exercises paper-scale Gram
assembly and the float32-Cholesky + float64-refinement solve."""

from configs.mnist_as_tf import (dataset_name, model_name, transforms,  # noqa: F401
                                 epochs, in_channels, out_channels,
                                 initial_model)

train_range = range(0, 16384)
validation_range = range(16384, 18432)
test_range = range(60000, 62048)
