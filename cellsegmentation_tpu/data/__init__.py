from cellsegmentation_tpu.data.lysto import LystoDataSource, LystoTestSource
from cellsegmentation_tpu.data.batches import (
    BatchIterator,
    normalize_images,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from cellsegmentation_tpu.data.synthetic import make_synthetic_h5

__all__ = [
    "LystoDataSource",
    "LystoTestSource",
    "BatchIterator",
    "normalize_images",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "make_synthetic_h5",
]
