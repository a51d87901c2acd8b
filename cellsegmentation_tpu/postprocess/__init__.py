from cellsegmentation_tpu.postprocess.morphology import (
    remove_small_objects,
    remove_small_holes,
    remove_small_regions,
    remove_small_regions_batch,
)
from cellsegmentation_tpu.postprocess.masks import (
    generate_masks,
    preprocess_masks,
    heatmap,
    overlap_mask,
    save_images_with_masks,
    dotting,
    locate_cells,
    crop_wsi,
    save_images,
)

__all__ = [
    "remove_small_objects",
    "remove_small_holes",
    "remove_small_regions",
    "remove_small_regions_batch",
    "generate_masks",
    "preprocess_masks",
    "heatmap",
    "overlap_mask",
    "save_images_with_masks",
    "dotting",
    "locate_cells",
    "crop_wsi",
    "save_images",
]
