"""Selection-identity check for the serving engines at REAL geometry.

Runs the trained-fixture fidelity gate of tests/test_q8_selection_identity.py
at the production geometry — 299x299 images, 32/20 tile grid (225
tiles/image), the grid the q8dg dense frontend actually serves — on real TPU
hardware (CPU interpret mode is impractical at this size). Trains a seeded
stage-1 -> stage-2 fixture so the int8 calibration faces trained activation
ranges, then compares flax vs q8 vs q8dg (engine="auto" resolution) sweeps:

    python tools/check_q8dg_fidelity.py          # N=16 images
    N=32 python tools/check_q8dg_fidelity.py

Reports, per engine: max |prob error|, the largest flax margin among flipped
top-k decisions, and the flip rate — the numbers that back (and tighten) the
err_bound / tie_eps / flip_budget constants in the CI gate. Spec: the
adaptive top-k of reference inference.py:31-43 driven by train_tile.py:118.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu import infer
from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops.infer_engine import pick_calib_images
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.trainers import train_stage1, train_stage2
from cellsegmentation_tpu.utils.logging import RunLogger

HW, TILE, INTERVAL = 299, 32, 20
N = int(os.environ.get("N", "16"))
TILES_PER_POS, TOPK_NEG = 2, 4

root = tempfile.mkdtemp()
h5 = f"{root}/training.h5"
make_synthetic_h5(h5, n_images=N, image_size=HW, max_cells=20, seed=7)
src = LystoDataSource(h5, train=True, kfold=None, seed=0)

model = build_model("resnet50", policy=F32_POLICY)
variables = init_variables(model, jax.random.PRNGKey(0))
logger = RunLogger(root, tensorboard=False)
print("training fixture (3 stage-1 + 4 stage-2 epochs)...", flush=True)
r1 = train_stage1(
    model, variables, src, None, epochs=3, batch_size=8, lr=1e-3,
    encoder_name="resnet50", output_dir=None, logger=logger, seed=0,
)
r2 = train_stage2(
    model, r1.state.variables, src, None,
    epochs=4, tile_batch_size=512, image_batch=8,
    tile_size=TILE, interval=INTERVAL, tiles_per_pos=TILES_PER_POS,
    topk_neg=TOPK_NEG, pos_neg_ratio=0.5, threshold=0.5, lr=1e-3,
    encoder_name="resnet50", output_dir=None, logger=logger, seed=0,
    infer_engine="flax",
)
logger.close()
variables = r2.state.variables
coords = tile_grid(HW, HW, TILE, INTERVAL)
labels = np.asarray(src.labels)

flax_fn = steps_mod.make_tile_infer_step(model, TILE, coords)
p_flax = infer.inference_tiles(src, flax_fn, variables, TILE, INTERVAL,
                               image_batch=8)

for engine in ("q8", "q8dg"):
    eng_fn = steps_mod.make_tile_infer_step(
        model, TILE, coords, variables=variables, engine=engine,
        calib_images=pick_calib_images(src.images),
    )
    p_eng = infer.inference_tiles(src, eng_fn, variables, TILE, INTERVAL,
                                  image_batch=8)
    err = float(np.abs(p_eng - p_flax).max())

    n_flips, worst_margin = 0, 0.0
    for i in range(len(src)):
        k = int(labels[i]) * TILES_PER_POS if labels[i] > 0 else TOPK_NEG
        k = min(k, p_flax.shape[1])
        order = np.argsort(-p_flax[i], kind="stable")
        boundary = p_flax[i][order[k - 1]]
        top_f = set(order[:k])
        top_q = set(np.argsort(-p_eng[i], kind="stable")[:k])
        for t in top_f.symmetric_difference(top_q):
            n_flips += 1
            worst_margin = max(worst_margin, abs(float(p_flax[i][t] - boundary)))
    print(
        f"{engine}: max|dprob|={err:.5f}  flips={n_flips}/{p_flax.size} "
        f"({n_flips / p_flax.size:.4%})  worst_flip_margin={worst_margin:.5f}",
        flush=True,
    )
