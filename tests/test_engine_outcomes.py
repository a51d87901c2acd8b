"""Outcome-level serving-engine closure (VERDICT r4 #2, CI half).

The q8dg fidelity gates (tests/test_q8_selection_identity.py) argue at the
margin level: flips are ties. This test converts that into end-to-end
evidence at CI scale: run stage-2 + pseudo-mask drawing TWICE from one
shared stage-1 checkpoint — ``infer_engine="flax"`` vs ``"auto"`` (the
q8dg serving default; interpret-mode Pallas on CPU) — and assert the
pipeline OUTCOMES agree: per-epoch selected-tile sets, validation tile
error, and the drawn pseudo-masks. The production-geometry hardware run
of the same diff lives in tools/pipeline_ab.py / docs/VALIDATION.md.

Reference cycle under test: inference.py:31-43 (selection) feeding
train_seg.py:219-276 (mask drawing).
"""

import jax
import numpy as np
import pytest

from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.trainers import (
    draw_pseudo_masks,
    train_stage1,
    train_stage2,
)
from cellsegmentation_tpu.utils.logging import RunLogger

HW, TS, IV = 48, 16, 8  # /4-aligned grid so "auto" resolves to q8dg


def _sel_key(sel):
    return set(
        zip(sel["img_idx"].tolist(), sel["xs"].tolist(), sel["ys"].tolist())
    )


def test_engine_outcomes_match_flax(tmp_path, monkeypatch):
    from cellsegmentation_tpu.ops import q8_trunk

    monkeypatch.setattr(q8_trunk, "TILE_ALIGN", 32)  # CPU interpret mode

    h5 = str(tmp_path / "training.h5")
    make_synthetic_h5(h5, n_images=12, image_size=HW, max_cells=8, seed=21)
    train_src = LystoDataSource(h5, train=True, kfold=4, seed=0)
    val_src = LystoDataSource(h5, train=False, kfold=4)
    full_src = LystoDataSource(h5, train=True, kfold=None)

    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    logger = RunLogger(str(tmp_path / "run"), tensorboard=False)

    # the serving default must actually engage on this fixture
    probe = steps_mod.make_tile_infer_step(
        model, TS, tile_grid(HW, HW, TS, IV), variables=variables,
        engine="auto", calib_images=full_src.images[:2],
    )
    assert probe.resolved_engine == "q8dg"

    r1 = train_stage1(
        model, variables, train_src, val_src, epochs=1, batch_size=6,
        lr=1e-3, test_every=1, encoder_name="resnet50", logger=logger,
        seed=0,
    )
    v1 = jax.device_get(r1.state.variables)

    out = {}
    for eng in ("flax", "auto"):
        r2 = train_stage2(
            model, jax.device_put(v1), train_src, val_src,
            epochs=2, tile_batch_size=256, image_batch=8,
            tile_size=TS, interval=IV, tiles_per_pos=2, topk_neg=4,
            pos_neg_ratio=0.5, threshold=0.5, lr=1e-3, test_every=2,
            encoder_name="resnet50", logger=logger, seed=0,
            infer_engine=eng, record_selection=True,
        )
        masks = draw_pseudo_masks(
            model, r2.state.variables, full_src, tile_size=TS, interval=IV,
            threshold=0.25, image_batch=8, logger=logger, engine=eng,
        )
        out[eng] = (r2, masks)

    a, b = out["flax"], out["auto"]

    # 1) the adaptive top-k selection cycle picks (near-)identical tile
    # sets — every disagreement is a prob tie at the selection boundary
    for e in range(2):
        ka, kb = _sel_key(a[0].selections[e]), _sel_key(b[0].selections[e])
        jac = len(ka & kb) / max(len(ka | kb), 1)
        assert jac >= 0.6, f"epoch {e + 1} selection Jaccard {jac:.3f}"

    # 2) validation tile error within noise (identical would be ideal but
    # tie flips shift a handful of training tiles)
    assert abs(a[0].last_metrics[0] - b[0].last_metrics[0]) <= 0.15

    # 3) the drawn pseudo-masks agree px-wise
    ma, mb = a[1] > 0, b[1] > 0
    assert ma.any() and mb.any(), "fixture kept no tiles — raise threshold"
    iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
    assert iou >= 0.7, f"pseudo-mask IoU between engines {iou:.3f}"
    logger.close()
