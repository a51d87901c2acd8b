"""Stage-3 evaluation CLI (reference: test_seg.py).

Four modes, mirroring the reference's dispatch (test_seg.py:594-660):
- ``--draw_masks``: mask overlays over h5/ROI/WSI patch sets;
- ``--detect``: full WSI/ROI detection — stitched masks, dual-head counts,
  mean-shift localization, (image_id, x, y) CSV with crash rollback;
- default: point-annotated evaluation (dice + point P/R/F1 per cancer/area
  bucket). NB: the reference stubs P/R/F1 to 0 (its matching call is
  commented out, test_seg.py:529-537); here the mean-shift + greedy matching
  actually runs. ``--parity_prf1`` restores the reference's zeros;
- ``--test_qupath``: score QuPath GeoJSON detections with the same metrics.

Usage:
    python -m cellsegmentation_tpu.cli.test_seg -m pt3.ckpt --draw_masks
    python -m cellsegmentation_tpu.cli.test_seg -m pt3.ckpt --detect --smooth_method gaussianblur
    python -m cellsegmentation_tpu.cli.test_seg -m pt3.ckpt --data_path point_root
"""

from __future__ import annotations

import argparse
import csv
import json
import os

import numpy as np

from cellsegmentation_tpu.cli import common
from cellsegmentation_tpu.data.masks import MaskTestSource, PointTestSource
from cellsegmentation_tpu.detect import MetricGroup, cell_detect, get_prf1, meanshift_cluster
from cellsegmentation_tpu.ops.losses import dice_coef
from cellsegmentation_tpu.postprocess import (
    crop_wsi,
    overlap_mask,
    remove_small_regions,
    save_images_with_masks,
)
from cellsegmentation_tpu.train import steps as steps_mod


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="pt.3 evaluation: segmentation & detection")
    parser.add_argument("-m", "--model", type=str, required=True)
    parser.add_argument("-B", "--batch_size", type=int, default=8)
    parser.add_argument("-c", "--threshold", type=float, default=0.5)
    parser.add_argument("--draw_masks", action="store_true")
    parser.add_argument("--detect", action="store_true")
    parser.add_argument("--test_qupath", type=str, default=None,
                        help="directory of QuPath GeoJSON detections")
    parser.add_argument("--smooth_method", type=str, default="gaussianblur",
                        choices=["gaussianblur", "distancetransform"])
    parser.add_argument("--eps", type=float, default=15)
    parser.add_argument("--reg_limit", action="store_true")
    parser.add_argument("--soft_mask", action="store_true")
    parser.add_argument("--cancer_type", action="store_true",
                        help="bucket point-eval metrics by cancer type")
    parser.add_argument("--area_type", action="store_true",
                        help="bucket point-eval metrics by area type")
    parser.add_argument("--parity_prf1", action="store_true",
                        help="reference parity: report P/R/F1 as 0")
    parser.add_argument("--resume_from", type=str, default=None)
    parser.add_argument("-o", "--output", type=str, default="./output")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("-d", "--device", type=int, default=0)
    parser.add_argument("-w", "--workers", type=int, default=4)
    return parser


def _point_eval(args, model, variables) -> None:
    seg_infer = steps_mod.make_seg_infer_step(model)
    image_infer = steps_mod.make_image_infer_step(model)
    testset = PointTestSource(args.data_path, num_of_imgs=1 if args.debug else 0)
    os.makedirs(args.output, exist_ok=True)

    if args.cancer_type:
        metrics = {k: MetricGroup() for k in ("breast", "colon", "prostate")}
        bucket_of = lambda name: testset.cancer_types.get(name, "colon")
    elif args.area_type:
        metrics = {k: MetricGroup() for k in ("regular", "clustered", "artifact")}
        bucket_of = lambda name: testset.area_types.get(name, "regular")
    else:
        metrics = MetricGroup()
        bucket_of = None

    import jax.numpy as jnp

    with open(os.path.join(args.output, "center.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "count", "tp", "fp", "fn", "p", "r", "f1", "dice"])
        for i in range(len(testset)):
            image = testset.images[i : i + 1]
            flip = jnp.zeros((1,), jnp.int32)
            mask_hat = np.asarray(seg_infer(variables, jnp.asarray(image), flip))[0]
            _, counts = image_infer(variables, jnp.asarray(image), flip)
            count = int(np.round(float(np.asarray(counts)[0])))
            if args.reg_limit and count == 0:
                mask_hat = 0 * mask_hat  # (reference: test_seg.py:522-524)

            classes = remove_small_regions(
                mask_hat > args.threshold, min_object_size=300, hole_area_threshold=100
            )
            gt_mask = (
                testset.masks[i].astype(np.float32)
                if testset.masks is not None
                else np.zeros_like(classes, dtype=np.float32)
            )
            dice = float(
                dice_coef(
                    jnp.asarray(classes.astype(np.float32)), jnp.asarray(gt_mask)
                )
            )

            if args.parity_prf1:
                p = r = f1 = tp = fp = fn = 0
            else:
                kept, _ = meanshift_cluster(
                    np.uint8(mask_hat * 255), args.smooth_method,
                    cell_count=count if args.reg_limit else None, eps=args.eps,
                )
                pred_points = np.asarray([(y, x) for (x, y) in kept])
                p, r, f1, tp, fp, fn = get_prf1(pred_points, testset.points[i])

            name = testset.names[i]
            if bucket_of is not None:
                metrics[bucket_of(name)].update([p, r, f1, dice])
            else:
                metrics.update([p, r, f1, dice])
            w.writerow([name, count, tp, fp, fn, p, r, f1, dice])

            # mask overlays (reference saves predict_mask/ + binary masks)
            import cv2

            bin_dir = os.path.join(args.output, "predict_mask_binary")
            ovl_dir = os.path.join(args.output, "predict_mask")
            os.makedirs(bin_dir, exist_ok=True)
            os.makedirs(ovl_dir, exist_ok=True)
            cv2.imwrite(
                os.path.join(bin_dir, name), (classes * 255).astype(np.uint8)
            )
            overlap_mask(
                testset.images[i].copy(), classes, postprocess=False,
                save=os.path.join(
                    ovl_dir, os.path.splitext(name)[0] + f"_{count}.png"
                ),
            )

    if isinstance(metrics, dict):
        for k, g in metrics.items():
            print(f"{k}: P={g.P.avg:.4f} R={g.R.avg:.4f} F1={g.F1.avg:.4f} dice={g.dice.avg:.4f}")
    else:
        print(
            f"Average Precision: {metrics.P.avg}\nAverage Recall: {metrics.R.avg}\n"
            f"Average F1: {metrics.F1.avg}\nAverage Dice: {metrics.dice.avg}"
        )


def _qupath_points(geojson_path: str) -> np.ndarray:
    """Extract detection centroids from a QuPath GeoJSON export."""
    with open(geojson_path) as f:
        data = json.load(f)
    feats = data["features"] if isinstance(data, dict) else data
    pts = []
    for feat in feats:
        geom = feat.get("geometry", {})
        if geom.get("type") == "Point":
            pts.append(geom["coordinates"][:2])
        elif geom.get("type") == "Polygon":
            ring = np.asarray(geom["coordinates"][0], dtype=float)
            pts.append(ring.mean(axis=0)[:2])
    return np.asarray(pts, dtype=float).reshape(-1, 2)


def _test_qupath(args) -> None:
    """Baseline A/B: score QuPath detections with the identical metric code
    (reference: test_seg.py:368-459)."""
    testset = PointTestSource(args.data_path, num_of_imgs=1 if args.debug else 0)
    metrics = MetricGroup()
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "qupath-center.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "tp", "fp", "fn", "p", "r", "f1"])
        for i, name in enumerate(testset.names):
            gj = os.path.join(
                args.test_qupath, os.path.splitext(name)[0] + ".geojson"
            )
            pred = _qupath_points(gj) if os.path.exists(gj) else np.zeros((0, 2))
            p, r, f1, tp, fp, fn = get_prf1(pred, testset.points[i])
            metrics.update([p, r, f1, 0.0])
            w.writerow([name, tp, fp, fn, p, r, f1])
    print(
        f"QuPath baseline — P={metrics.P.avg:.4f} R={metrics.R.avg:.4f} "
        f"F1={metrics.F1.avg:.4f}"
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.data_path is None:
        args.data_path = common.resolve_data_path(args)

    if args.test_qupath:
        _test_qupath(args)
        return

    model, variables, _ = common.load_stage_checkpoint(args.model, args)

    if args.draw_masks or args.detect:
        src_path = args.data_path
        if not src_path.endswith(".h5") and os.path.isdir(src_path):
            crop_wsi(src_path)  # (reference: test_seg.py:616-618)
        testset = MaskTestSource(
            src_path, resume_from=args.resume_from,
            num_of_imgs=20 if args.debug else 0,
        )
        seg_infer = steps_mod.make_seg_infer_step(model)
        if args.detect:
            image_infer = steps_mod.make_image_infer_step(model)
            out = cell_detect(
                testset, seg_infer, image_infer, variables,
                batch_size=args.batch_size, output_path=args.output,
                method=args.smooth_method, eps=args.eps,
                resume=args.resume_from is not None,
            )
            print(f"Detection results saved in '{out}'.")
        else:
            import jax.numpy as jnp

            # stream patch batches (a WSI patch set does not fit in RAM)
            os.makedirs(args.output, exist_ok=True)
            idx = 0
            for s in range(0, len(testset), args.batch_size):
                chunk = np.stack(
                    [
                        testset.get_patch(i)
                        for i in range(s, min(s + args.batch_size, len(testset)))
                    ]
                )
                m = np.asarray(
                    seg_infer(
                        variables, jnp.asarray(chunk),
                        jnp.zeros((len(chunk),), jnp.int32),
                    )
                )
                save_images_with_masks(
                    list(chunk), list(m), args.threshold, args.output,
                    soft=args.soft_mask, start_index=idx,
                )
                idx += len(chunk)
        return

    _point_eval(args, model, variables)


if __name__ == "__main__":
    main()
