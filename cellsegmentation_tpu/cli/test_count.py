"""Stage-1 evaluation CLI (reference: test_count.py).

One model over test.h5, or three per-organ models whose predictions are
merged by image id (reference: test_count.py:53-77). ``--cls_limit`` clamps
regressed counts into the predicted class's range.

Usage:
    python -m cellsegmentation_tpu.cli.test_count -m output/pt1_50epochs.ckpt
    python -m cellsegmentation_tpu.cli.test_count -m colon.ckpt breast.ckpt prostate.ckpt
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np

from cellsegmentation_tpu.cli import common
from cellsegmentation_tpu.data.lysto import LystoTestSource
from cellsegmentation_tpu.infer import inference_image
from cellsegmentation_tpu.models.milnet import ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY
from cellsegmentation_tpu.train import steps as steps_mod

ORGANS = ("colon", "breast", "prostate")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="pt.1 evaluation: cell counting")
    parser.add_argument("-m", "--model", type=str, nargs="+", required=True,
                        help="1 checkpoint, or 3 per-organ (colon breast prostate)")
    parser.add_argument("-B", "--batch_size", type=int, default=128)
    parser.add_argument("--cls_limit", action="store_true")
    parser.add_argument("-o", "--output", type=str, default="./output")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("-d", "--device", type=int, default=0)
    parser.add_argument("-w", "--workers", type=int, default=4)
    return parser


def _load(path: str, args):
    model, variables, ckpt = common.load_stage_checkpoint(
        path, args, partitions=(ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY)
    )
    return model, variables, ckpt


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    data_path = common.resolve_data_path(args)
    h5 = os.path.join(data_path, "test.h5")
    num = 20 if args.debug else 0
    os.makedirs(args.output, exist_ok=True)
    now = time.strftime("%Y%m%d-%H%M%S")

    if len(args.model) == 3:
        ids = np.array([], dtype=np.int64)
        counts = np.array([], dtype=np.int64)
        for organ, path in zip(ORGANS, args.model):
            source = LystoTestSource(h5, organ=organ, num_of_imgs=num)
            model, variables, _ = _load(path, args)
            infer_fn = steps_mod.make_image_infer_step(model)
            _, organ_counts = inference_image(
                source, infer_fn, variables, batch_size=args.batch_size,
                cls_limit=args.cls_limit,
            )
            ids = np.concatenate([ids, source.ids])
            counts = np.concatenate([counts, organ_counts])
        counts = counts[np.argsort(ids)]
        out_csv = os.path.join(args.output, f"{now}-count.csv")
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["id", "count"])
            for i, y in enumerate(counts, start=1):
                w.writerow([i, y])
    elif len(args.model) == 1:
        source = LystoTestSource(h5, num_of_imgs=num)
        model, variables, ckpt = _load(args.model[0], args)
        infer_fn = steps_mod.make_image_infer_step(model)
        _, counts = inference_image(
            source, infer_fn, variables, batch_size=args.batch_size,
            cls_limit=args.cls_limit,
        )
        out_csv = os.path.join(args.output, f"{now}-count-e{ckpt['epoch']}.csv")
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["id", "count", "organ"])
            for i, y in enumerate(counts, start=1):
                w.writerow([i, y, source.organs[i - 1]])
    else:
        raise SystemExit("expected 1 or 3 checkpoints")
    print(f"Results saved in '{out_csv}'.")


if __name__ == "__main__":
    main()
