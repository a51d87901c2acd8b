"""Steady-state wall-time of the stage-3 16/5 tile sweep, per engine.

Separates the three costs that tools/bench_masks.py conflates:
  1. engine build (weight fold/calibration host fetches + trace),
  2. first-dispatch compile,
  3. steady-state per-step wall (synced with a scalar fetch per step).

Usage: ENGINES="q8 q8g flax" G=64 python tools/bench_s3_steady.py
Reference hot loop: train_seg.py:232 over the 16/5 grid (train_seg.py:39-42).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.train import steps as steps_mod

TS = int(os.environ.get("TS", "16"))
IV = int(os.environ.get("IV", "5"))
G = int(os.environ.get("G", "64"))
STEPS = int(os.environ.get("STEPS", "6"))
ENGINES = os.environ.get("ENGINES", "q8 q8g flax auto").split()

coords = tile_grid(299, 299, TS, IV)
t_per_img = len(coords)
model = build_model(os.environ.get("ENCODER", "resnet50"))
variables = init_variables(model, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
imgs = rng.integers(0, 255, size=(G, 299, 299, 3), dtype=np.uint8)
b = jnp.asarray(imgs)
flip = np.zeros((G,), np.int32)
float(jnp.sum(b))  # materialize inputs before any timing

for eng in ENGINES:
    kwargs = (
        dict(variables=variables, engine=eng, calib_images=imgs[:4])
        if eng != "flax"
        else {}
    )
    t0 = time.perf_counter()
    infer = steps_mod.make_tile_infer_step(model, TS, coords, **kwargs)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(infer(variables, b, flip)))
    t_first = time.perf_counter() - t0
    walls = []
    for _ in range(STEPS):
        t0 = time.perf_counter()
        float(jnp.sum(infer(variables, b, flip)))
        walls.append(time.perf_counter() - t0)
    walls = np.array(walls)
    med = float(np.median(walls))
    print(
        f"{eng:5s} resolved={infer.resolved_engine:5s} "
        f"build={t_build:6.2f}s first={t_first:6.2f}s "
        f"steady={med * 1e3:8.1f} ms/step "
        f"({G / med:7.1f} masks/s, {G * t_per_img / med:9.0f} tiles/s) "
        f"min={walls.min() * 1e3:.1f} max={walls.max() * 1e3:.1f}"
    )
print("DONE")
