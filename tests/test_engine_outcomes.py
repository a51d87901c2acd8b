"""Outcome-level serving-engine closure (VERDICT r4 #2, CI half).

The q8dg fidelity gates (tests/test_q8_selection_identity.py) argue at the
margin level: flips are ties. This test converts that into end-to-end
evidence at CI scale, mirroring the hardware harness (tools/pipeline_ab.py
/ docs/VALIDATION.md) in two parts:

1. SAME-WEIGHTS engine diff — train stage-2 once with flax, then draw
   pseudo-masks from the SAME weights through flax vs an explicit
   ``"q8dg"`` (the serving default engine, which "auto" only promotes to
   on real accelerators; interpret-mode Pallas on CPU): per-tile probs,
   keep-set flips, and painted masks must agree. This isolates per-call
   engine error (hardware: 0.05% keep flips, |dprob| mean 0.0055).
2. COMPOUNDED-training diff — rerun the stage-2 MIL cycle with
   infer_engine="q8dg" and assert the validation outcome lands within
   noise of the flax cycle. Per-epoch selection overlap is NOT asserted
   here: on a briefly-trained fixture the top-k is tie-dominated, so
   engine tie flips legitimately reshuffle it (hardware run: Jaccard
   0.105 epoch 1 -> 0.286 epoch 8 while end-task quality stayed equal or
   better); decisive-margin selection identity is gated by
   tests/test_q8_selection_identity.py instead.

Reference cycle under test: inference.py:31-43 (selection) feeding
train_seg.py:219-276 (mask drawing).
"""

import jax
import numpy as np

from cellsegmentation_tpu import infer
from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops import infer_engine as infer_engine_mod
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.trainers import (
    draw_pseudo_masks,
    train_stage1,
    train_stage2,
)
from cellsegmentation_tpu.utils.logging import RunLogger

# /4-aligned grid; HW=52 (not 48) so the 16/8 grid has a border-completion
# tile (starts [0..32] + border at 36) — dense_grid_meta rejects grids that
# end exactly at the image edge (not the LYSTO geometry)
HW, TS, IV = 52, 16, 8


def test_engine_outcomes_match_flax(tmp_path, monkeypatch):
    from cellsegmentation_tpu.ops import q8_trunk

    monkeypatch.setattr(q8_trunk, "TILE_ALIGN", 32)  # CPU interpret mode

    h5 = str(tmp_path / "training.h5")
    # radius 6-10 px cells: a 16-px tile over a cell is mostly cell, so the
    # short MIL cycle reaches discriminative probs (the default 3-6 px
    # cells leave the fixture tie-dominated — see tools/pipeline_ab.py)
    make_synthetic_h5(h5, n_images=12, image_size=HW, max_cells=3, seed=21,
                      cell_r2=(36, 100))
    train_src = LystoDataSource(h5, train=True, kfold=4, seed=0)
    val_src = LystoDataSource(h5, train=False, kfold=4)
    full_src = LystoDataSource(h5, train=True, kfold=None)

    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    logger = RunLogger(str(tmp_path / "run"), tensorboard=False)

    # "auto" never promotes to the dense engine on the CPU backend
    # (steps._resolve_dense_engine — interpret-mode Pallas is not a serving
    # target), so the serving default is exercised here via an EXPLICIT
    # q8dg request, which is always honored. Probe that it engages:
    probe = steps_mod.make_tile_infer_step(
        model, TS, tile_grid(HW, HW, TS, IV), variables=variables,
        engine="q8dg", calib_images=full_src.images[:2],
    )
    assert probe.resolved_engine == "q8dg"

    r1 = train_stage1(
        model, variables, train_src, val_src, epochs=2, batch_size=6,
        lr=1e-3, test_every=2, encoder_name="resnet50", logger=logger,
        seed=0,
    )
    v1 = jax.device_get(r1.state.variables)

    # ---- flax training run (the baseline cycle)
    r2a = train_stage2(
        model, jax.device_put(v1), train_src, val_src,
        epochs=3, tile_batch_size=256, image_batch=8,
        tile_size=TS, interval=IV, tiles_per_pos=2, topk_neg=4,
        pos_neg_ratio=0.5, threshold=0.5, lr=1e-3, test_every=3,
        encoder_name="resnet50", logger=logger, seed=0,
        infer_engine="flax",
    )
    v2 = jax.device_get(r2a.state.variables)

    # ---- part 1: SAME-WEIGHTS engine diff at the mask grid
    coords = tile_grid(HW, HW, TS, IV)
    calib = infer_engine_mod.pick_calib_images(full_src.images)
    probs = {}
    for eng in ("flax", "q8dg"):
        fn = steps_mod.make_tile_infer_step(
            model, TS, coords, variables=jax.device_put(v2), engine=eng,
            calib_images=calib,
        )
        assert fn.resolved_engine == eng
        probs[eng] = infer.inference_tiles(
            full_src, fn, jax.device_put(v2), TS, IV, image_batch=8
        )

    dp = np.abs(probs["flax"] - probs["q8dg"])
    assert dp.max() <= 0.15, f"same-weights |dprob| max {dp.max():.4f}"

    # shared absolute threshold from the flax prob distribution (the
    # bimodal-gap midpoint — a bulk quantile amplifies tiny deltas)
    thresh = 0.5 * float(np.quantile(probs["flax"], 0.999))
    keep_a = probs["flax"] > thresh
    keep_b = probs["q8dg"] > thresh
    flips = int((keep_a != keep_b).sum())
    assert keep_a.any(), "fixture kept no tiles — fixture regressed"
    assert flips / keep_a.size <= 0.02, (
        f"same-weights keep-set flips {flips}/{keep_a.size}"
    )

    # Neutralize the artifact-clearing count gate (keep &= counts != 0,
    # trainers.py:606): it runs through the ENGINE-INDEPENDENT flax image
    # head, so it cancels in the A/B — but on this 2-epoch fixture the
    # underfit count head predicts 0 everywhere, which would void the mask
    # comparison. The gate's behavior is covered by tests/test_trainers.py
    # and the hardware harness (tools/pipeline_ab.py: count==0 on 25/48).
    # both drawing paths (streamed single-process and fused multi-host)
    # derive counts via infer._clean_counts, so patching it to all-ones
    # neutralizes the gate everywhere
    real_clean_counts = infer._clean_counts
    monkeypatch.setattr(
        infer, "_clean_counts",
        lambda regs: np.ones(len(regs), np.int64),
    )
    masks = {
        eng: draw_pseudo_masks(
            model, jax.device_put(v2), full_src, tile_size=TS, interval=IV,
            threshold=thresh, image_batch=8, logger=logger, engine=eng,
        )
        for eng in ("flax", "q8dg")
    }
    monkeypatch.setattr(infer, "_clean_counts", real_clean_counts)
    ma, mb = masks["flax"] > 0, masks["q8dg"] > 0
    assert ma.any() and mb.any()
    iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
    assert iou >= 0.7, f"same-weights pseudo-mask IoU {iou:.3f}"

    # ---- part 2: COMPOUNDED cycle through the engine lands within noise
    r2b = train_stage2(
        model, jax.device_put(v1), train_src, val_src,
        epochs=3, tile_batch_size=256, image_batch=8,
        tile_size=TS, interval=IV, tiles_per_pos=2, topk_neg=4,
        pos_neg_ratio=0.5, threshold=0.5, lr=1e-3, test_every=3,
        encoder_name="resnet50", logger=logger, seed=0,
        infer_engine="q8dg",
    )
    assert abs(r2a.last_metrics[0] - r2b.last_metrics[0]) <= 0.15
    logger.close()
