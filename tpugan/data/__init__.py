from tpugan.data.sources import (  # noqa: F401
    ArrayDataset,
    load_mnist,
    synthetic_image_dataset,
    mnist_or_synthetic,
    mnistm_or_synthetic,
    synthetic_mnistm_like,
)
from tpugan.data.loader import (  # noqa: F401
    DeviceLoader,
    UnpairedLoader,
    ZipLoader,
)
