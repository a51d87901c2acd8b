"""Outcome-level serving-engine closure: run the full 3-stage pipeline
twice — ``--infer_engine flax`` vs ``auto`` (q8dg at stage-2, q8 at
stage-3) — from one shared stage-1 checkpoint, and diff what comes out the
other end (VERDICT r4 item 2):

  - per-epoch selected-tile set Jaccard overlap (stage-2 selection cycle,
    reference: inference.py:31-43),
  - final tile CE + val tile error,
  - pseudo-mask agreement IoU between engines and IoU vs the synthetic
    blob GT (reference: train_seg.py:219-276),
  - stage-3 decoder final dice,
  - detection P/R/F1 of mask-derived centers vs the synthetic GT centers.

Prints a markdown table for docs/VALIDATION.md. Run on the TPU:

    python tools/pipeline_ab.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu import infer
from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.detect.metrics import get_prf1
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops import infer_engine as infer_engine_mod
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.postprocess.masks import generate_masks
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.trainers import (
    train_stage1,
    train_stage2,
    train_stage3,
)
from cellsegmentation_tpu.utils.logging import RunLogger

N = int(os.environ.get("N", "48"))
S1_EPOCHS = int(os.environ.get("S1_EPOCHS", "20"))
S2_EPOCHS = int(os.environ.get("S2_EPOCHS", "8"))
S3_EPOCHS = int(os.environ.get("S3_EPOCHS", "4"))
# Stage-2 trains at 16-px tiles (interval 8, /4-aligned so "auto" exercises
# q8dg) instead of the production 32/20: a briefly-trained synthetic
# classifier does not transfer from 32-px training crops to the 16-px mask
# grid (measured probs max 0.008 at 16 px after 32-px training), and the
# outcome diff needs discriminative probs at the geometry the masks are
# drawn on. The reference's 32->16 transfer rests on converged real-data
# training (train_seg.py:39-42) this fixture cannot reproduce.
S2_TS = int(os.environ.get("S2_TS", "16"))
S2_IV = int(os.environ.get("S2_IV", "8"))
# The reference's production mask threshold is 0.95 (train_seg.py:41) — an
# absolute prob a briefly-trained synthetic fixture never reaches (its 16-px
# tile probs top out well below the 32-px training confidence). The mask
# threshold is a user hyperparameter in the reference CLI (train_seg.py -t);
# here it is derived ONCE from the flax run's prob distribution — half the
# q0.999 prob, i.e. the midpoint of the bimodal gap, NOT a bulk quantile
# (a threshold inside a dense prob cluster amplifies sub-0.004 engine
# deltas into huge keep-set diffs) — and the SAME absolute value is reused
# for the auto engine, so the mask diff stays a pure engine A/B.
# THRESH overrides.
THRESH = float(os.environ["THRESH"]) if "THRESH" in os.environ else None

d = tempfile.mkdtemp()
# cells at radius 5-11 px (cell_r2 = r^2 bounds): a 16-px tile over a cell
# is mostly cell, so the MIL top-k cycle bootstraps from a random fc_tile
# at the production 16-px mask geometry (the default 3-6 px cells fill so
# little of a 16-px tile that epoch-1 selection is ~99% mislabeled there)
gen = make_synthetic_h5(f"{d}/training.h5", n_images=N, image_size=299,
                        max_cells=12, seed=7, cell_r2=(25, 121))
train_src = LystoDataSource(f"{d}/training.h5", train=True, kfold=4, seed=0)
val_src = LystoDataSource(f"{d}/training.h5", train=False, kfold=4)
# masks are drawn over the full set, mirroring cli/train_seg.py:81
full_src = LystoDataSource(f"{d}/training.h5", train=True, kfold=None, seed=0)

model = build_model("resnet50")
variables = init_variables(model, jax.random.PRNGKey(0))

print(f"stage 1 (shared): {len(train_src)} train / {len(val_src)} val ...",
      flush=True)
t0 = time.perf_counter()
r1 = train_stage1(
    model, variables, train_src, val_src, epochs=S1_EPOCHS, batch_size=8, lr=1e-3,
    test_every=S1_EPOCHS, encoder_name="resnet50",
    logger=RunLogger(f"{d}/s1", tensorboard=False), seed=0,
)
v1 = jax.device_get(r1.state.variables)
print(f"  done in {time.perf_counter() - t0:.0f}s", flush=True)


def tile_sel_key(sel):
    return set(zip(sel["img_idx"].tolist(), sel["xs"].tolist(),
                   sel["ys"].tolist()))


def mask_centers(mask: np.ndarray) -> np.ndarray:
    """Connected-component centroids of one [H, W] binary mask."""
    from scipy import ndimage

    lab, n = ndimage.label(mask > 0)
    if n == 0:
        return np.zeros((0, 2))
    return np.asarray(ndimage.center_of_mass(mask > 0, lab, range(1, n + 1)))


H, W = full_src.image_hw
COORDS = tile_grid(H, W, 16, 5)  # the production 16/5 mask grid
thresh = THRESH

# RUNS: two "engine[@stage2-seed]" specs to compare. The default is the
# engine A/B; RUNS=flax,flax@1 is the NOISE CONTROL — same engine, one
# seed apart — that calibrates how much of the A/B's outcome delta is
# plain selection-cycle stochasticity rather than engine numerics.
RUNS = os.environ.get("RUNS", "flax,auto").split(",")

results = {}
for spec in RUNS:
    eng, _, sd = spec.partition("@")
    s2_seed = int(sd or 0)
    print(f"=== run={spec} ===", flush=True)
    t0 = time.perf_counter()
    r2 = train_stage2(
        model, jax.device_put(v1), train_src, val_src,
        epochs=S2_EPOCHS, tile_batch_size=4096, image_batch=48,
        tile_size=S2_TS, interval=S2_IV,
        lr=5e-4, test_every=S2_EPOCHS, encoder_name="resnet50",
        logger=RunLogger(f"{d}/s2_{spec}", tensorboard=False), seed=s2_seed,
        infer_engine=eng, record_selection=True,
    )
    v2 = jax.device_get(r2.state.variables)
    print(f"  stage 2 in {time.perf_counter() - t0:.0f}s "
          f"val={r2.last_metrics}", flush=True)

    # pseudo-mask drawing, inlined from trainers.draw_pseudo_masks
    # (trainers.py:558-629) so both engines share one absolute threshold and
    # the per-tile prob stats are visible
    t0 = time.perf_counter()
    v2d = jax.device_put(v2)
    tiles_fn = steps_mod.make_tile_infer_step(
        model, 16, COORDS, variables=v2d, engine=eng,
        calib_images=infer_engine_mod.pick_calib_images(full_src.images),
    )
    probs = infer.inference_tiles(full_src, tiles_fn, v2d, 16, 5,
                                  image_batch=48)  # [N, T]
    _, counts = infer.inference_image(
        full_src, steps_mod.make_image_infer_step(model), v2d, batch_size=48
    )
    if thresh is None:  # flax runs first: derive the shared threshold
        thresh = 0.5 * float(np.quantile(probs, 0.999))
    print(f"  16/5 probs: max {probs.max():.3f} mean {probs.mean():.3f} "
          f"q0.999 {np.quantile(probs, 0.999):.3f} | shared thresh "
          f"{thresh:.3f} | count==0 on {int((counts == 0).sum())}/{N} images",
          flush=True)
    keep = (probs > thresh) & (counts != 0)[:, None]
    groups, tile_idx = np.nonzero(keep)
    masks = generate_masks(full_src.images, groups, COORDS[tile_idx], 16,
                           save_masks=False)
    print(f"  masks in {time.perf_counter() - t0:.0f}s "
          f"({int((masks > 0).any(axis=(1, 2)).sum())} non-empty, "
          f"{int(keep.sum())} tiles kept)", flush=True)

    from cellsegmentation_tpu.data.masks import MaskDataSource

    mask_src = MaskDataSource(f"{d}/training.h5", masks)
    t0 = time.perf_counter()
    r3 = train_stage3(
        model, jax.device_put(v2), mask_src, epochs=S3_EPOCHS, batch_size=8,
        lr=5e-5, encoder_name="resnet50",
        logger=RunLogger(f"{d}/s3t_{spec}", tensorboard=False), seed=0,
    )
    print(f"  stage 3 in {time.perf_counter() - t0:.0f}s "
          f"dice_loss={r3.last_loss}", flush=True)

    # detection: predicted-mask centroids vs synthetic GT centers
    seg_fn = steps_mod.make_seg_infer_step(model)
    v3 = r3.state.variables
    pred = np.asarray(
        seg_fn(v3, full_src.images[:16], np.zeros(16, np.int32))
    )
    tp = fp = fn = 0
    for i in range(16):
        pts_hat = mask_centers(pred[i] > 0.5)
        gt = gen["centers"][i]
        _, _, _, tpi, fpi, fni = get_prf1(pts_hat, gt)
        tp, fp, fn = tp + tpi, fp + fpi, fn + fni
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    f1 = 2 * p * r / max(p + r, 1e-9)

    results[spec] = dict(
        v2=v2,
        selections=r2.selections, val=r2.last_metrics, masks=masks,
        dice=r3.last_loss, prf1=(p, r, f1), probs=probs,
    )

# ---- diff table
a, b = results[RUNS[0]], results[RUNS[1]]
la = RUNS[0]
lb = RUNS[1] if RUNS[1] != "auto" else "auto (q8dg/q8)"
print(f"\n| outcome | {la} | {lb} | delta |")
print("|---|---|---|---|")
for e in range(S2_EPOCHS):
    ka, kb = tile_sel_key(a["selections"][e]), tile_sel_key(b["selections"][e])
    j = len(ka & kb) / max(len(ka | kb), 1)
    print(f"| epoch-{e + 1} selected-tile Jaccard | {len(ka)} tiles | "
          f"{len(kb)} tiles | {j:.3f} overlap |")
print(f"| val tile (err, fpr, fnr) | {a['val']} | {b['val']} | - |")
dp = np.abs(a["probs"] - b["probs"])
print(f"| 16/5-grid |dprob| (engine + s2-model divergence) | - | - | "
      f"max {dp.max():.4f} / mean {dp.mean():.5f} |")
ma, mb = a["masks"] > 0, b["masks"] > 0
inter, union = (ma & mb).sum(), (ma | mb).sum()
print(f"| pseudo-mask IoU (engines) | - | - | "
      f"{inter / max(union, 1):.4f} |")
gt_blob = full_src.images.mean(axis=-1) < 160
for name, mm in ((la, ma), (lb, mb)):
    i2, u2 = (mm & gt_blob).sum(), (mm | gt_blob).sum()
    print(f"| pseudo-mask IoU vs GT blobs ({name}) | | | "
          f"{i2 / max(u2, 1):.4f} |")
print(f"| stage-3 final dice loss | {a['dice']:.4f} | {b['dice']:.4f} | "
      f"{abs(a['dice'] - b['dice']):.4f} |")
print(f"| detection P/R/F1 | {a['prf1'][0]:.3f}/{a['prf1'][1]:.3f}/"
      f"{a['prf1'][2]:.3f} | {b['prf1'][0]:.3f}/{b['prf1'][1]:.3f}/"
      f"{b['prf1'][2]:.3f} | f1 {abs(a['prf1'][2] - b['prf1'][2]):.3f} |")

# ---- same-weights decomposition: run B's ENGINE on run A's trained
# weights, so the |dprob| row above splits into per-call engine error
# (this row) vs selection-feedback training drift (the rest)
eng_b = RUNS[1].partition("@")[0]
if eng_b != RUNS[0].partition("@")[0]:
    va = jax.device_put(a["v2"])
    fn_b = steps_mod.make_tile_infer_step(
        model, 16, COORDS, variables=va, engine=eng_b,
        calib_images=infer_engine_mod.pick_calib_images(full_src.images),
    )
    probs_b_on_a = infer.inference_tiles(full_src, fn_b, va, 16, 5,
                                         image_batch=48)
    dpe = np.abs(a["probs"] - probs_b_on_a)
    keep_b = (probs_b_on_a > thresh)
    keep_a = (a["probs"] > thresh)
    flips = int((keep_a != keep_b).sum())
    print(f"| same-weights engine-only |dprob| (16/5) | - | - | "
          f"max {dpe.max():.4f} / mean {dpe.mean():.5f} |")
    print(f"| same-weights keep-set flips @thresh | {int(keep_a.sum())} "
          f"kept | {int(keep_b.sum())} kept | {flips} flips "
          f"({flips / keep_a.size:.2%}) |")
print("DONE")
