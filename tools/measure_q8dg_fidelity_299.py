"""Measure q8dg selection fidelity at the REAL serving geometry (299/32/20)
with TRAINED weights (round-3 VERDICT weak #3: the 54/16/8 fixture bounds
the dense engine only at toy geometry).

Trains a deterministic stage-1 -> stage-2 fixture on synthetic 299x299
LYSTO-shaped data (trained weights produce the activation ranges the int8
calibration actually faces), then sweeps every tile with the exact flax
path and the dense shared-stem int8-GEMM engine (q8dg — the engine="auto"
resolution on accelerators) and reports

  - max |p_q8dg - p_flax| over all N*225 tiles,
  - adaptive top-k selection flips (reference: inference.py:31-43) and the
    flax margin of every flip,

the numbers that back tests/test_q8_selection_identity.py's real-geometry
gate. Runs on CPU (Pallas interpret mode, ~15-30 min) or on the TPU
(real kernels, minutes).

    python tools/measure_q8dg_fidelity_299.py            # CPU or TPU
    CST_PLATFORM=cpu python tools/measure_q8dg_fidelity_299.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# importing cli.common applies CST_PLATFORM + the compilation cache setup
import cellsegmentation_tpu.cli.common  # noqa: F401

import jax  # noqa: E402

from cellsegmentation_tpu import infer  # noqa: E402
from cellsegmentation_tpu.core.dtypes import F32_POLICY  # noqa: E402
from cellsegmentation_tpu.data import (  # noqa: E402
    LystoDataSource,
    make_synthetic_h5,
)
from cellsegmentation_tpu.models import build_model, init_variables  # noqa: E402
from cellsegmentation_tpu.ops.infer_engine import pick_calib_images  # noqa: E402
from cellsegmentation_tpu.ops.tiles import tile_grid  # noqa: E402
from cellsegmentation_tpu.train import steps as steps_mod  # noqa: E402
from cellsegmentation_tpu.train.trainers import (  # noqa: E402
    train_stage1,
    train_stage2,
)
from cellsegmentation_tpu.utils.logging import RunLogger  # noqa: E402

HW, TILE, INTERVAL = 299, 32, 20
N_IMAGES = int(os.environ.get("N", "12"))
TILES_PER_POS, TOPK_NEG = 2, 8


def main() -> None:
    root = tempfile.mkdtemp(prefix="q8dg299_")
    h5 = os.path.join(root, "training.h5")
    make_synthetic_h5(h5, n_images=N_IMAGES, image_size=HW, max_cells=20,
                      seed=7)
    src = LystoDataSource(h5, train=True, kfold=None, seed=0)
    model = build_model("resnet50", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    logger = RunLogger(root, tensorboard=False)
    print("training stage 1 ...", flush=True)
    r1 = train_stage1(
        model, variables, src, None, epochs=3, batch_size=6, lr=1e-3,
        encoder_name="resnet50", output_dir=None, logger=logger, seed=0,
    )
    print("training stage 2 ...", flush=True)
    r2 = train_stage2(
        model, r1.state.variables, src, None,
        epochs=2, tile_batch_size=512, image_batch=6,
        tile_size=TILE, interval=INTERVAL, tiles_per_pos=TILES_PER_POS,
        topk_neg=TOPK_NEG, pos_neg_ratio=0.5, threshold=0.5, lr=1e-3,
        encoder_name="resnet50", output_dir=None, logger=logger, seed=0,
        infer_engine="flax",
    )
    logger.close()
    trained = r2.state.variables

    coords = tile_grid(HW, HW, TILE, INTERVAL)
    flax_fn = steps_mod.make_tile_infer_step(model, TILE, coords)
    q8dg_fn = steps_mod.make_tile_infer_step(
        model, TILE, coords, variables=trained, engine="q8dg",
        calib_images=pick_calib_images(src.images),
    )
    assert getattr(q8dg_fn, "resolved_engine", None) == "q8dg"
    print("sweeping flax ...", flush=True)
    p_flax = infer.inference_tiles(
        src, flax_fn, trained, TILE, INTERVAL, image_batch=6
    )
    print("sweeping q8dg ...", flush=True)
    p_q8 = infer.inference_tiles(
        src, q8dg_fn, trained, TILE, INTERVAL, image_batch=6
    )

    err = float(np.abs(p_q8 - p_flax).max())
    labels = np.asarray(src.labels)
    n_flips, max_flip_margin = 0, 0.0
    for i in range(len(src)):
        k = int(labels[i]) * TILES_PER_POS if labels[i] > 0 else TOPK_NEG
        k = min(max(k, 1), p_flax.shape[1])
        order = np.argsort(-p_flax[i], kind="stable")
        boundary = p_flax[i][order[k - 1]]
        top_f = set(order[:k])
        top_q = set(np.argsort(-p_q8[i], kind="stable")[:k])
        for t in top_f.symmetric_difference(top_q):
            n_flips += 1
            max_flip_margin = max(
                max_flip_margin, abs(float(p_flax[i][t] - boundary))
            )
    print(json.dumps({
        "geometry": f"{HW}/{TILE}/{INTERVAL}",
        "n_images": N_IMAGES,
        "n_tiles": int(p_flax.size),
        "max_abs_prob_err": round(err, 5),
        "selection_flips": n_flips,
        "flip_fraction": round(n_flips / p_flax.size, 5),
        "max_flip_margin": round(max_flip_margin, 5),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
