"""Ensemble evaluation CLI (reference: test_ensemble.py).

Loads every ``*_<epoch>epochs.ckpt`` in a directory, averages the rounded
per-model counts (reference: test_ensemble.py:41-52).

Usage:
    python -m cellsegmentation_tpu.cli.test_ensemble -m ./output -e 30
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import time

import numpy as np

from cellsegmentation_tpu.cli import common
from cellsegmentation_tpu.data.lysto import LystoTestSource
from cellsegmentation_tpu.infer import inference_image
from cellsegmentation_tpu.models.milnet import ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY
from cellsegmentation_tpu.train import steps as steps_mod


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="pt.1 ensemble evaluation")
    parser.add_argument("-m", "--model", type=str, required=True,
                        help="directory of fold checkpoints")
    parser.add_argument("-e", "--epoch", type=int, default=30,
                        help="epoch tag of the checkpoints to load")
    parser.add_argument("-B", "--batch_size", type=int, default=128)
    parser.add_argument("--cls_limit", action="store_true")
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
    source = LystoTestSource(h5, num_of_imgs=20 if args.debug else 0)
    os.makedirs(args.output, exist_ok=True)
    now = time.strftime("%Y%m%d-%H%M%S")

    paths = sorted(
        glob.glob(os.path.join(args.model, f"*_{args.epoch}epochs.ckpt"))
    )
    if not paths:
        raise SystemExit(f"no *_{args.epoch}epochs.ckpt files in {args.model}")

    outputs = []
    for i, path in enumerate(paths):
        print(f"Testing {i + 1}/{len(paths)}...")
        model, variables, _ = common.load_stage_checkpoint(
            path, args, partitions=(ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY)
        )
        infer_fn = steps_mod.make_image_infer_step(model)
        _, counts = inference_image(
            source, infer_fn, variables, batch_size=args.batch_size,
            cls_limit=args.cls_limit,
        )
        outputs.append(counts)

    final = np.asarray(outputs).mean(axis=0).round().astype(int)
    out_csv = os.path.join(args.output, f"{now}-count-e{args.epoch}.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "count", "organ"])
        for i, y in enumerate(final, start=1):
            w.writerow([i, y, source.organs[i - 1]])
    print(f"Results saved in '{out_csv}'.")


if __name__ == "__main__":
    main()
