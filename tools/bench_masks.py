"""Measure stage-3 pseudo-mask drawing throughput (16/5 grid).

Decomposes the number tools like this used to conflate (round-4 recorded
"6.2 masks/s" — 94% of which was one-time engine build amortized over a
single 64-image batch):

  1. engine build: weight fold + int8 calibration + trace/compile — paid
     once per draw_pseudo_masks call (or once per process with a prebuilt
     ``infer_tiles_fn``);
  2. steady-state end-to-end masks/s: sweep + threshold + artifact
     clearing, engine prebuilt — the marginal rate a production LYSTO run
     (~20k images, reference train_seg.py:219-276) sees;
  3. host-side painting at a realistic kept fraction.

Run on a real chip:  ENGINE=auto N=64 python tools/bench_masks.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops import infer_engine as infer_engine_mod
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.trainers import draw_pseudo_masks
from cellsegmentation_tpu.utils.logging import RunLogger

N = int(os.environ.get("N", "64"))
IB = int(os.environ.get("IB", "64"))  # image_batch: N/IB batches per call
# UNFUSED=1 reproduces the pre-round-5 two-pass orchestration (separate
# inference_tiles + inference_image uploads) for a same-session A/B bracket
UNFUSED = os.environ.get("UNFUSED", "") == "1"
# 0.95 (the serving default) keeps ~no tiles on random-init weights and
# skips the painting path entirely; THRESH=0.5 forces a realistic kept
# fraction so the number covers sweep + artifact clearing + painting
THRESH = float(os.environ.get("THRESH", "0.5"))
# BIAS_COUNTS=1 pins the image count head to a constant 5 (zero final
# kernel + positive bias) so the artifact-clearing gate passes and the
# steady-state loop actually paints — the configuration where the fused
# path's paint/device overlap shows up. Default off: continuity with the
# sweep-only numbers recorded in docs/PERF.md.
BIAS_COUNTS = os.environ.get("BIAS_COUNTS", "") == "1"
d = tempfile.mkdtemp()
make_synthetic_h5(f"{d}/training.h5", n_images=N, image_size=299,
                  max_cells=20, seed=9)
src = LystoDataSource(f"{d}/training.h5", train=True, kfold=None, seed=0)

model = build_model("resnet50")
variables = init_variables(model, jax.random.PRNGKey(0))
if BIAS_COUNTS:
    from cellsegmentation_tpu.models.milnet import pin_constant_count_head

    pin_constant_count_head(variables)
logger = RunLogger(d, tensorboard=False)

ENGINE = os.environ.get("ENGINE", "auto")

# 1. engine build (weight fold + calibration + trace; compile lands on the
# first dispatch inside the warm call below)
t0 = time.perf_counter()
infer_tiles_fn = steps_mod.make_tile_infer_step(
    model, 16, tile_grid(299, 299, 16, 5),
    variables=variables, engine=ENGINE,
    calib_images=infer_engine_mod.pick_calib_images(src.images),
)
t_build = time.perf_counter() - t0
print(f"engine build ({ENGINE} -> {infer_tiles_fn.resolved_engine}): "
      f"{t_build:.2f}s one-time", flush=True)

if UNFUSED:
    from cellsegmentation_tpu import infer
    from cellsegmentation_tpu.postprocess.masks import generate_masks as _gm

    infer_image_fn = steps_mod.make_image_infer_step(model)

    def _draw(model, variables, src, image_batch, threshold, logger,
              infer_tiles_fn):
        probs = infer.inference_tiles(
            src, infer_tiles_fn, variables, 16, 5, image_batch=image_batch)
        keep = probs > threshold
        _, counts = infer.inference_image(
            src, infer_image_fn, variables, batch_size=image_batch)
        keep &= (counts != 0)[:, None]
        coords_ = tile_grid(299, 299, 16, 5)
        g, ti = np.nonzero(keep)
        return _gm(src.images[np.arange(len(src))], g, coords_[ti], 16,
                   save_masks=False)

    draw = _draw
else:
    draw = draw_pseudo_masks

kwargs = dict(image_batch=IB, threshold=THRESH, logger=logger,
              infer_tiles_fn=infer_tiles_fn)
draw(model, variables, src, **kwargs)  # warm (compile)

# 2. steady-state end-to-end (sweep + threshold + artifact clearing)
for _ in range(2):
    t0 = time.perf_counter()
    masks = draw(model, variables, src, **kwargs)
    dt = time.perf_counter() - t0
    print(f"{N} images ({N * 3249} tiles at 16/5, threshold {THRESH}, "
          f"batch {IB}, fused={not UNFUSED}, "
          f"{int((masks > 0).any(axis=(1, 2)).sum())} non-empty masks) "
          f"in {dt:.2f}s -> {N / dt:.1f} masks/s steady-state", flush=True)

# 3. On random-init weights no tile clears the threshold/count gates, so
# the loop above times the sweep alone. Time the host-side painting
# separately on a realistic kept fraction (~3% of tiles, the trained-run
# figure from docs/VALIDATION.md) so the end-to-end estimate is honest:
from cellsegmentation_tpu.postprocess.masks import generate_masks

coords = tile_grid(299, 299, 16, 5)
rng = np.random.default_rng(0)
kept = rng.random((N, len(coords))) < 0.03
groups, tile_idx = np.nonzero(kept)
images = src.images[np.arange(N)]
# save_masks=False: time the painting alone, not cv2 PNG encode + disk
# writes (and keep the repo tree clean — advisor finding, round 4)
generate_masks(images, groups, coords[tile_idx], 16, save_masks=False)  # warm
t0 = time.perf_counter()
generate_masks(images, groups, coords[tile_idx], 16, save_masks=False)
dt = time.perf_counter() - t0
print(f"painting {kept.sum()} kept tiles (3%) on {N} images in {dt:.2f}s "
      f"-> {N / dt:.1f} masks/s host-side", flush=True)
