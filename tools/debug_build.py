"""Time each phase of the stage-3 engine build (diagnosing build latency).

Usage: ENGINE=q8g python tools/debug_build.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops import infer_engine as ie
from cellsegmentation_tpu.ops.tiles import tile_grid

ENGINE = os.environ.get("ENGINE", "q8g")
TS, IV = 16, 5

t0 = time.perf_counter()
model = build_model("resnet50")
variables = init_variables(model, jax.random.PRNGKey(0))
float(jax.numpy.sum(variables["params"]["fc_tile"]["Dense_0"]["bias"]))
print(f"init+backend: {time.perf_counter() - t0:.2f}s")

coords = tile_grid(299, 299, TS, IV)
rng = np.random.default_rng(0)
imgs = rng.integers(0, 255, size=(4, 299, 299, 3), dtype=np.uint8)

t0 = time.perf_counter()
calib = ie.calib_tiles_from_images(imgs, coords, TS)
print(f"calib tiles: {time.perf_counter() - t0:.2f}s shape={calib.shape}")

t0 = time.perf_counter()
trunk = ie.fold_tile_trunk(model, variables)
print(f"fold (batched device_get + np fold): {time.perf_counter() - t0:.2f}s")

t0 = time.perf_counter()
tree = jax.device_put(trunk.tree())
jax.block_until_ready(jax.tree_util.tree_leaves(tree)[0])
print(f"device_put trunk tree: {time.perf_counter() - t0:.2f}s")

deep = ENGINE in ("q8g", "q8dg")
t0 = time.perf_counter()
scales = ie.calibrate_trunk(trunk, np.asarray(calib, np.float32), deep=deep)
print(f"calibrate (deep={deep}): {time.perf_counter() - t0:.2f}s")

if deep:
    from cellsegmentation_tpu.ops.q8_trunk import build_q8_backend

    t0 = time.perf_counter()
    qparams, qmetas = build_q8_backend(trunk, scales, TS // 4, TS // 4)
    print(f"build_q8_backend (np): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    qp = jax.device_put(qparams)
    jax.block_until_ready(jax.tree_util.tree_leaves(qp)[0])
    print(f"device_put qparams: {time.perf_counter() - t0:.2f}s")

from cellsegmentation_tpu.train import steps as steps_mod

t0 = time.perf_counter()
fn = steps_mod.make_tile_infer_step(
    model, TS, coords, variables=variables, engine=ENGINE, calib_images=imgs
)
print(f"make_tile_infer_step total (2nd build, warm caches): "
      f"{time.perf_counter() - t0:.2f}s resolved={fn.resolved_engine}")
print("DONE")
