"""Time q8dg serving-chain variants on the TPU at the bench geometry.

The round-3 measurement queue (docs/PERF.md "remaining levers") — run when
a real chip is attached; each variant is already fidelity-gated on CPU:

    python tools/time_dense_variants.py              # splits (2,0) vs (1,1)
    python tools/time_dense_variants.py 1,1 1,0      # chosen splits
    G=384 python tools/time_dense_variants.py        # image-batch sweep
    CST_STEM=s2d CST_POOL=shift python tools/time_dense_variants.py
    CST_W2=wholetile python tools/time_dense_variants.py 1,0   # tap A/B

Round-4 additions: the (1,0) split + the tap-accumulating 3x3
(q8_conv3_tap, default W2_IMPL="auto" = tap on >9-px maps) moves ALL of
layer2 into GEMM-land with zero Toeplitz redundancy — time splits (2,0),
(1,1) and (1,0), and CST_W2=wholetile isolates the tap kernel's own
contribution.

Winners get promoted to defaults (make_dense_tile_probs gemm_first_* /
infer_engine._STEM_IMPL/_POOL_IMPL / q8_trunk.W2_IMPL) and re-recorded
via bench.py --record.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops import infer_engine as ie
from cellsegmentation_tpu.ops.infer_engine import (
    calib_tiles_from_images,
    make_dense_tile_probs,
)
from cellsegmentation_tpu.ops.tiles import tile_grid

from cellsegmentation_tpu.ops import q8_trunk as qt

TILE, INTERVAL, HW = 32, 20, 299
G = int(os.environ.get("G", "192"))
ie._STEM_IMPL = os.environ.get("CST_STEM", ie._STEM_IMPL)
ie._POOL_IMPL = os.environ.get("CST_POOL", ie._POOL_IMPL)
qt.W2_IMPL = os.environ.get("CST_W2", qt.W2_IMPL)
print(f"G={G} stem={ie._STEM_IMPL} pool={ie._POOL_IMPL} "
      f"w2={qt.W2_IMPL}", flush=True)

splits = [tuple(map(int, s.split(","))) for s in sys.argv[1:]] or [
    (2, 0), (1, 1), (1, 0)]

model = build_model("resnet50")
variables = init_variables(model, jax.random.PRNGKey(0))
coords = tile_grid(HW, HW, TILE, INTERVAL)
rng = np.random.default_rng(0)
batches = [
    jnp.asarray(rng.integers(0, 255, size=(G, HW, HW, 3), dtype=np.uint8))
    for _ in range(4)
]
calib = calib_tiles_from_images(np.asarray(batches[0][:4]), coords, TILE)
head = variables["params"]["fc_tile"]

for fs, fb in splits:
    fn, tree = make_dense_tile_probs(
        model, variables, TILE, INTERVAL, HW, calib, backend="gemm",
        gemm_first_stage=fs, gemm_first_block=fb,
    )
    jfn = jax.jit(lambda h, t, im: fn(h, t, im, None))

    def run(k):
        t0 = time.perf_counter()
        sums = []
        for i in range(k):
            sums.append(jnp.sum(jfn(head, tree, batches[i % 4])))
        float(jnp.stack(sums).sum())  # ONE scalar sync (tunnel discipline)
        return time.perf_counter() - t0

    run(2)   # compile + warm
    run(10)  # shape-specific reduction compile out of the window
    step = min(run(10) for _ in range(3)) / 10
    print(f"split=({fs},{fb}): {step * 1e3:.2f} ms/step -> "
          f"{G / step:.0f} img/s", flush=True)
