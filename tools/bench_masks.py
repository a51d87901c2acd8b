"""Measure stage-3 pseudo-mask drawing throughput (16/5 grid, q8 engine).

Records the masks/s number for docs/VALIDATION.md. The 16/5 sweep is the
densest in the pipeline (~3,249 tiles/image, 9.63x pixel-redundant) and
structurally cannot share stem compute (docs/PERF.md), so it serves the
per-tile q8 engine. Run on a real chip:

    python tools/bench_masks.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.train.trainers import draw_pseudo_masks
from cellsegmentation_tpu.utils.logging import RunLogger

N = int(os.environ.get("N", "64"))
d = tempfile.mkdtemp()
make_synthetic_h5(f"{d}/training.h5", n_images=N, image_size=299,
                  max_cells=20, seed=9)
src = LystoDataSource(f"{d}/training.h5", train=True, kfold=None, seed=0)

model = build_model("resnet50")
variables = init_variables(model, jax.random.PRNGKey(0))
logger = RunLogger(d, tensorboard=False)

draw_pseudo_masks(model, variables, src, image_batch=64, logger=logger)  # warm
for _ in range(2):
    t0 = time.perf_counter()
    draw_pseudo_masks(model, variables, src, image_batch=64, logger=logger)
    dt = time.perf_counter() - t0
    print(f"{N} images ({N * 3249} tiles at 16/5) in {dt:.2f}s "
          f"-> {N / dt:.1f} masks/s", flush=True)
