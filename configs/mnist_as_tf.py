"""ResNet-32 GP on MNIST with the original TF paper's train/val/test split
(reference: configs/mnist_as_tf.py:1-49).  Published MNIST errors: 0.68%
validation / 0.84% test (reference README.md:95)."""

from cnn_gp_tpu import Conv2d, ReLU, Sequential

from configs._resnet32 import resnet32_trunk

train_range = range(5000, 55000)
validation_range = list(range(55000, 60000)) + list(range(0, 5000))
test_range = range(60000, 70000)

dataset_name = "MNIST"
model_name = "ResNet"
transforms = []
epochs = 0
in_channels = 1
out_channels = 10

initial_model = Sequential(
    *resnet32_trunk(),
    # No nonlinearity here, the next Conv2d substitutes the average pooling
    Conv2d(kernel_size=7, padding=0, in_channel_multiplier=4,
           out_channel_multiplier=4),
    ReLU(),
    Conv2d(kernel_size=1, padding=0, in_channel_multiplier=4),
)
