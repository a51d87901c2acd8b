from cellsegmentation_tpu.ops.tiles import tile_grid, extract_tiles, num_tiles
from cellsegmentation_tpu.ops.topk import adaptive_topk_mask, topk_threshold_mask
from cellsegmentation_tpu.ops.categorize import (
    categorize,
    de_categorize,
    categorize_np,
    de_categorize_np,
    CLASS_MIN_COUNT,
    CLASS_MAX_COUNT,
    NUM_CLASSES,
)
from cellsegmentation_tpu.ops.resize import resize_bilinear_align_corners
from cellsegmentation_tpu.ops.losses import (
    cross_entropy,
    mse,
    weighted_mse,
    dice_coef,
    dice_loss,
)
from cellsegmentation_tpu.ops.metrics import calc_err, quadratic_weighted_kappa, qwk_device
from cellsegmentation_tpu.ops.hsv import rgb_value_channel, hsv_refine_mask
from cellsegmentation_tpu.ops.pooling import global_avg_max_pool

__all__ = [
    "tile_grid",
    "extract_tiles",
    "num_tiles",
    "adaptive_topk_mask",
    "topk_threshold_mask",
    "categorize",
    "de_categorize",
    "categorize_np",
    "de_categorize_np",
    "CLASS_MIN_COUNT",
    "CLASS_MAX_COUNT",
    "NUM_CLASSES",
    "resize_bilinear_align_corners",
    "cross_entropy",
    "mse",
    "weighted_mse",
    "dice_coef",
    "dice_loss",
    "calc_err",
    "quadratic_weighted_kappa",
    "qwk_device",
    "rgb_value_channel",
    "hsv_refine_mask",
    "global_avg_max_pool",
]
