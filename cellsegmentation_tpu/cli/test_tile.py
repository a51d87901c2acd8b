"""Stage-2 evaluation CLI: per-tile heatmaps (reference: test_tile.py).

Dense tile inference over test.h5, threshold filter, optional ``--reg_limit``
artifact clearing (drop tiles on images whose predicted count is 0,
reference: test_tile.py:87-105), then JET heatmap overlays + per-tile CSV.

Usage:
    python -m cellsegmentation_tpu.cli.test_tile -m output/pt2_30epochs.ckpt \
        -t 32 -i 5 -c 0.95 [--reg_limit]
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np

from cellsegmentation_tpu.cli import common
from cellsegmentation_tpu.data.lysto import LystoTestSource
from cellsegmentation_tpu.infer import inference_image, inference_tiles
from cellsegmentation_tpu.models.milnet import (
    ENCODER_KEY,
    IMAGE_CLS_KEY,
    IMAGE_REG_KEY,
    TILE_KEY,
)
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.postprocess.masks import heatmap
from cellsegmentation_tpu.train import steps as steps_mod


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="pt.2 evaluation: tile heatmaps")
    parser.add_argument("-m", "--model", type=str, required=True)
    parser.add_argument("-B", "--batch_size", type=int, default=128,
                        help="image batch for dense tile inference")
    parser.add_argument("-t", "--tile_size", type=int, default=32)
    parser.add_argument("-i", "--interval", type=int, default=5)
    parser.add_argument("-c", "--threshold", type=float, default=0.95)
    parser.add_argument("--reg_limit", action="store_true")
    parser.add_argument("--infer_engine",
                        choices=("auto", "q8", "q8g", "q8d", "q8dg", "flax"),
                        default="flax",
                        help="dense-sweep engine; eval defaults to the exact "
                             "flax path so reported tile metrics carry no "
                             "quantization error (serving engines opt-in)")
    parser.add_argument("-o", "--output", type=str, default="./output")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("-d", "--device", type=int, default=0)
    parser.add_argument("-w", "--workers", type=int, default=4)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    data_path = common.resolve_data_path(args)
    h5 = os.path.join(data_path, "test.h5")
    num = 20 if args.debug else 0
    os.makedirs(args.output, exist_ok=True)
    now = time.strftime("%Y%m%d-%H%M%S")

    source = LystoTestSource(h5, num_of_imgs=num)
    model, variables, ckpt = common.load_stage_checkpoint(
        args.model, args,
        partitions=(ENCODER_KEY, TILE_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY),
    )
    h0, w0 = source.image_hw
    engine_kwargs = {}
    if args.infer_engine != "flax":
        from cellsegmentation_tpu.ops.infer_engine import pick_calib_images

        engine_kwargs = dict(
            variables=variables, engine=args.infer_engine,
            calib_images=pick_calib_images(source.images),
        )
    tile_infer = steps_mod.make_tile_infer_step(
        model, args.tile_size, tile_grid(h0, w0, args.tile_size, args.interval),
        **engine_kwargs,
    )
    probs = inference_tiles(
        source, tile_infer, variables, args.tile_size, args.interval,
        image_batch=args.batch_size,
    )  # [N, T]

    h, w = source.image_hw
    coords = tile_grid(h, w, args.tile_size, args.interval)
    keep = probs > args.threshold

    if args.reg_limit:
        image_infer = steps_mod.make_image_infer_step(model)
        _, counts = inference_image(
            source, image_infer, variables, batch_size=args.batch_size
        )
        with open(
            os.path.join(args.output, f"{now}-count-e{ckpt['epoch']}.csv"),
            "w", newline="",
        ) as f:
            cw = csv.writer(f)
            cw.writerow(["id", "count", "organ"])
            for i, y in enumerate(counts, start=1):
                cw.writerow([i, y, source.organs[i - 1]])
        keep &= (counts != 0)[:, None]

    groups, tile_idx = np.nonzero(keep)
    tiles_xy = coords[tile_idx]
    tile_probs = probs[groups, tile_idx]

    csv_path = os.path.join(
        args.output,
        f"{now}-pred-e{ckpt['epoch']}-p{args.tile_size}-i{args.interval}-c{args.threshold}.csv",
    )
    with open(csv_path, "w", newline="") as f:
        cw = csv.writer(f)
        cw.writerow(["tile_size", args.tile_size])
        cw.writerow(["interval", args.interval])
        cw.writerow(["idx", "grid", "prob"])
    heatmap(
        source.images, groups, tiles_xy, tile_probs, args.tile_size,
        args.output, csv_path=None,
    )
    # append per-tile rows to the pred CSV (reference keeps both in one file)
    with open(csv_path, "a", newline="") as f:
        cw = csv.writer(f)
        for i, g in enumerate(groups):
            cw.writerow([g, f"[{tiles_xy[i, 0]}, {tiles_xy[i, 1]}]", tile_probs[i]])
    print(f"Test results saved in '{args.output}'.")


if __name__ == "__main__":
    main()
