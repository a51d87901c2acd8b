from cellsegmentation_tpu.detect.cluster import meanshift_cluster, vectorized_meanshift
from cellsegmentation_tpu.detect.metrics import AverageMeter, MetricGroup, get_prf1
from cellsegmentation_tpu.detect.detect import cell_detect

__all__ = [
    "meanshift_cluster",
    "vectorized_meanshift",
    "AverageMeter",
    "MetricGroup",
    "get_prf1",
    "cell_detect",
]
