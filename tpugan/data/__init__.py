from tpugan.data.sources import (  # noqa: F401
    ArrayDataset,
    load_mnist,
    synthetic_image_dataset,
    mnist_or_synthetic,
)
from tpugan.data.loader import DeviceLoader  # noqa: F401
