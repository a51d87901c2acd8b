"""Full 3-stage pipeline on synthetic data: counter → MIL tiles → seg masks.

The TPU analogue of running the reference's train_image → train_tile →
train_seg chain with --debug. Exercises checkpoint handoff between stages,
the adaptive top-k cycle, pseudo-mask drawing, and decoder training.
"""

import glob
import os

import jax
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.data import LystoDataSource, make_synthetic_h5
from cellsegmentation_tpu.data.masks import MaskDataSource
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.models.milnet import (
    ENCODER_KEY,
    IMAGE_CLS_KEY,
    IMAGE_REG_KEY,
    TILE_KEY,
    pin_constant_count_head,
)
from cellsegmentation_tpu.train import checkpoint as ckpt_mod
from cellsegmentation_tpu.train.trainers import (
    draw_pseudo_masks,
    train_stage1,
    train_stage2,
    train_stage3,
)
from cellsegmentation_tpu.utils.logging import RunLogger


HW = 48  # tiny images keep the CPU suite fast; every op is size-generic


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    h5 = str(root / "training.h5")
    make_synthetic_h5(h5, n_images=16, image_size=HW, max_cells=8, seed=11)
    return root, h5


def test_full_pipeline(pipeline_dir):
    root, h5 = pipeline_dir
    out = str(root / "out")
    logger = RunLogger(out, tensorboard=False)
    model = build_model("resnet18", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))

    train_src = LystoDataSource(h5, train=True, kfold=4, seed=0)
    val_src = LystoDataSource(h5, train=False, kfold=4)

    # ---- stage 1
    r1 = train_stage1(
        model, variables, train_src, val_src,
        epochs=1, batch_size=6, lr=1e-3, test_every=1,
        encoder_name="resnet18", output_dir=out, logger=logger, seed=0,
    )
    pt1 = sorted(glob.glob(os.path.join(out, "pt1_*.ckpt")))[-1]

    # ---- stage 2 (handoff: encoder + image heads from pt1)
    fresh = init_variables(model, jax.random.PRNGKey(1))
    ckpt1 = ckpt_mod.load_checkpoint(pt1)
    params, stats = ckpt_mod.restore_into(
        fresh["params"], fresh["batch_stats"], ckpt1,
        partitions=(ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY),
    )
    v2 = {"params": params, "batch_stats": stats}
    r2 = train_stage2(
        model, v2, train_src, val_src,
        epochs=1, tile_batch_size=512, image_batch=8,
        tile_size=16, interval=8, tiles_per_pos=2, topk_neg=4,
        pos_neg_ratio=0.5, threshold=0.5,
        lr=1e-3, encoder_name="resnet18", output_dir=out, logger=logger, seed=0,
    )
    assert r2.last_metrics is not None
    err, fpr, fnr = r2.last_metrics
    assert 0 <= err <= 1
    pt2 = sorted(glob.glob(os.path.join(out, "pt2_*.ckpt")))[-1]

    # encoder unchanged by stage 2 (frozen); fc_tile differs from pt1's fresh
    ckpt2 = ckpt_mod.load_checkpoint(pt2)
    np.testing.assert_array_equal(
        np.asarray(ckpt2["state_dict"]["params"]["encoder"]["conv1"]["kernel"]),
        np.asarray(ckpt1["state_dict"]["params"]["encoder"]["conv1"]["kernel"]),
    )
    assert "fc_tile" in ckpt2["state_dict"]["params"]

    # ---- stage 3: pseudo-masks + decoder training
    draw_src = LystoDataSource(h5, train=True, kfold=None)
    masks = draw_pseudo_masks(
        model, r2.state.variables, draw_src,
        tile_size=8, interval=4, threshold=0.2, image_batch=8,
        preprocess=True, output_path=str(root / "pseudomask"), logger=logger,
    )
    assert masks.shape == (16, HW, HW)
    assert (root / "pseudomask" / "mask" / "00001.png").exists()

    mask_src = MaskDataSource(h5, masks)
    r3 = train_stage3(
        model, r2.state.variables, mask_src,
        epochs=1, batch_size=4, lr=1e-3,
        encoder_name="resnet18", output_dir=out, logger=logger, seed=0,
    )
    assert r3.last_loss is not None and 0 <= r3.last_loss <= 1
    pt3 = sorted(glob.glob(os.path.join(out, "pt3_*.ckpt")))
    assert pt3, "stage-3 checkpoint missing"
    ckpt3 = ckpt_mod.load_checkpoint(pt3[-1])
    assert "seg_decoder" in ckpt3["state_dict"]["params"]
    logger.close()


def test_tile_infer_consistency():
    """Device tile extraction + batched forward == forwarding hand-sliced
    tiles one by one (the reference's mode-1 path)."""
    import jax.numpy as jnp

    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    model = build_model("resnet18", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    coords = tile_grid(48, 48, 16, 16)
    infer_fn = steps_mod.make_tile_infer_step(model, 16, coords)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(2, 48, 48, 3), dtype=np.uint8)

    probs = np.asarray(
        infer_fn(variables, jnp.asarray(images), jnp.zeros(2, jnp.int32))
    )

    from cellsegmentation_tpu.data.batches import normalize_images

    @jax.jit
    def direct(tiles):
        x = normalize_images(tiles, jnp.zeros(tiles.shape[0], jnp.int32))
        logits = model.apply(variables, x, mode="tile", train=False)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    hand = np.stack(
        [images[b, x : x + 16, y : y + 16] for b in range(2) for x, y in coords]
    )
    want = np.asarray(direct(jnp.asarray(hand))).reshape(2, -1)
    np.testing.assert_allclose(probs, want, rtol=2e-4, atol=2e-5)


def test_streamed_draw_matches_unfused_composition(pipeline_dir, tmp_path):
    """The single-process streamed drawing pipeline (one upload per batch,
    per-batch threshold/clear/paint/save) must byte-match the unfused
    composition inference_tiles + inference_image + generate_masks —
    including HSV refinement and the saved png trees (global 1-based
    naming across uneven batches)."""
    import cv2

    from cellsegmentation_tpu import infer
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.postprocess.masks import generate_masks
    from cellsegmentation_tpu.train import steps as steps_mod

    root, h5 = pipeline_dir
    src = LystoDataSource(h5, train=True, kfold=None)
    model = build_model("resnet18")
    variables = init_variables(model, jax.random.PRNGKey(3))
    # the random-init regressor's artifact-clearing gate would keep nothing:
    # pin every image's count to 5 so the kept set is non-trivial
    pin_constant_count_head(variables)
    ts, iv, thresh = 8, 4, 0.3
    logger = RunLogger(str(tmp_path), tensorboard=False)

    tile_fn = steps_mod.make_tile_infer_step(
        model, ts, tile_grid(HW, HW, ts, iv), variables=variables,
        engine="flax",
    )
    out_a = tmp_path / "streamed"
    masks = draw_pseudo_masks(
        model, variables, src, tile_size=ts, interval=iv,
        threshold=thresh, image_batch=6,  # 16 images -> uneven last batch
        preprocess=True, output_path=str(out_a), logger=logger,
        infer_tiles_fn=tile_fn,
    )

    # unfused oracle composition (the pre-round-5 orchestration)
    image_fn = steps_mod.make_image_infer_step(model)
    probs = infer.inference_tiles(src, tile_fn, variables, ts, iv,
                                  image_batch=6)
    _, counts = infer.inference_image(src, image_fn, variables, batch_size=6)
    keep = (probs > thresh) & (counts != 0)[:, None]
    coords = tile_grid(HW, HW, ts, iv)
    groups, tile_idx = np.nonzero(keep)
    out_b = tmp_path / "unfused"
    want = generate_masks(
        src.images[src.base_idx], groups, coords[tile_idx], ts,
        preprocess=True, save_masks=True, output_path=str(out_b),
    )

    assert keep.sum() > 0, "fixture kept no tiles — test is vacuous"
    np.testing.assert_array_equal(masks, want)
    for sub in ("rgb", "mask"):
        a_files = sorted(os.listdir(out_a / sub))
        b_files = sorted(os.listdir(out_b / sub))
        assert a_files == b_files and len(a_files) == len(src)
        for f in a_files:
            a_img = cv2.imread(str(out_a / sub / f), cv2.IMREAD_UNCHANGED)
            b_img = cv2.imread(str(out_b / sub / f), cv2.IMREAD_UNCHANGED)
            np.testing.assert_array_equal(a_img, b_img)
    logger.close()
