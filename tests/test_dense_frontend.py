"""Tests for the shared dense stem+layer1 frontend (ops/dense_frontend.py).

The dense formulation approximates the reference's per-tile zero-padded
forward only at stem/layer1 receptive fields that cross tile borders; away
from borders the math is identical. These tests pin (a) the grid geometry
metadata, (b) exact interior agreement of the dense stem features with the
per-tile stem, and (c) end-to-end ranking fidelity vs the flax path with
flip codes exercised (reference formulation: inference.py:9-28 + per-tile
flips at dataset/dataset.py:210-211).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cellsegmentation_tpu.ops import dense_frontend as df


def test_dense_grid_meta():
    m = df.dense_grid_meta(299, 32, 20)
    assert m is not None
    assert (m.n_reg, m.n_all, m.bx, m.crop0, m.cropw) == (14, 15, 267, 7, 292)
    m150 = df.dense_grid_meta(150, 32, 20)
    assert m150 is not None
    assert (m150.n_reg, m150.bx, m150.crop0, m150.cropw) == (6, 118, 18, 132)
    assert df.dense_grid_meta(299, 16, 5) is None  # stage-3 grid: 5 % 4 != 0
    assert df.dense_grid_meta(292, 32, 20) is None  # no border-completion


def _structured_images(hw, g, seed=3):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    return np.stack([
        (127 + 120 * np.sin(xx / 23.0 + i) * np.cos(yy / 17.0 - i)
         + rng.normal(0, 20, (hw, hw))).clip(0, 255)
        for i in range(g)
    ]).astype(np.uint8)[..., None].repeat(3, axis=-1)


def test_interior_patches_match_per_tile_stem():
    """Away from tile borders the dense stem+maxpool ≡ the per-tile stem
    exactly (same convs, same weights); only receptive fields that cross
    the tile border differ (zero pad vs real neighbors). Layer1's ±3-row
    /4-resolution receptive field spreads the border effect across the
    whole 8x8 patch, so exactness is pinned at the stem/maxpool level and
    the full path by the ranking test below."""
    from cellsegmentation_tpu.data.batches import normalize_images
    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops.infer_engine import (
        fold_tile_trunk, trunk_forward,
    )

    hw, ts, interval = 150, 32, 20
    meta = df.dense_grid_meta(hw, ts, interval)
    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    trunk = fold_tile_trunk(model, variables)
    strides = tuple(trunk.strides)
    tree = trunk.tree()
    imgs = _structured_images(hw, 1)
    flip = jnp.zeros((1,), jnp.int32)

    def stem_pool(u8):  # stem + maxpool only (n_stages=0)
        x = normalize_images(
            u8, jnp.zeros((u8.shape[0],), jnp.int32), dtype=jnp.bfloat16
        )
        return trunk_forward(tree, strides, x, n_stages=0)

    patches = df.frontend_patches(meta, stem_pool, jnp.asarray(imgs), flip)
    patches = np.asarray(patches, np.float32)  # [T, 8, 8, 64]

    for (i, j) in [(2, 3), (0, 0), (meta.n_all - 1, 1)]:
        x0 = meta.bx if i == meta.n_reg else i * interval
        y0 = meta.bx if j == meta.n_reg else j * interval
        tile = imgs[0, x0 : x0 + ts, y0 : y0 + ts][None]
        per_tile = np.asarray(stem_pool(jnp.asarray(tile)), np.float32)[0]
        got = patches[i * meta.n_all + j]
        # pool rows/cols 2..5 have receptive fields fully inside the tile
        inner = np.s_[2:6, 2:6, :]
        np.testing.assert_allclose(got[inner], per_tile[inner], rtol=0.05,
                                   atol=0.05)
        # border rows DO differ (the documented approximation)
        assert np.abs(got - per_tile).max() > 0.0


@pytest.mark.parametrize("engine", ["q8d", "q8dg"])
def test_dense_ranking_matches_flax(engine, monkeypatch):
    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops import q8_trunk
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    monkeypatch.setattr(q8_trunk, "TILE_ALIGN", 32)

    tile, interval, hw, g = 32, 20, 150, 2
    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    coords = tile_grid(hw, hw, tile, interval)
    imgs = _structured_images(hw, g)
    flip = jnp.asarray([0, 3], jnp.int32)  # exercise the mirrored gather

    ref_fn = steps_mod.make_tile_infer_step(model, tile, coords)
    p_ref = np.asarray(ref_fn(variables, jnp.asarray(imgs), flip)).ravel()

    fn = steps_mod.make_tile_infer_step(
        model, tile, coords, variables=variables, engine=engine,
        calib_images=imgs,
    )
    p = np.asarray(fn(variables, jnp.asarray(imgs), flip)).ravel()

    from scipy.stats import spearmanr

    assert spearmanr(p_ref, p).statistic > 0.8
    assert np.abs(p - p_ref).max() < 0.05


@pytest.mark.parametrize("split", [(1, 1), (1, 0)])
def test_gemm_split_variants_match_flax(split, monkeypatch):
    """The conv/GEMM split is block-granular (ops/q8_trunk.py): every
    supported split point must preserve ranking fidelity vs the flax path.
    The default (2, 0) is covered by the q8dg tests above; this pins the
    deeper GEMM entries — (1, 1) = layer2 blocks 1-3 in GEMM-land, (1, 0)
    = the hybrid c1/proj conv entry."""
    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops import q8_trunk
    from cellsegmentation_tpu.ops.infer_engine import (
        calib_tiles_from_images, make_dense_tile_probs,
    )
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    monkeypatch.setattr(q8_trunk, "TILE_ALIGN", 32)

    tile, interval, hw, g = 32, 20, 150, 2
    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    coords = tile_grid(hw, hw, tile, interval)
    imgs = _structured_images(hw, g)
    flip0 = np.zeros((g,), np.int32)

    ref_fn = steps_mod.make_tile_infer_step(model, tile, coords)
    p_ref = np.asarray(
        ref_fn(variables, jnp.asarray(imgs), jnp.asarray(flip0))
    ).ravel()

    calib = calib_tiles_from_images(imgs, coords, tile)  # normalized tiles
    fn, tree = make_dense_tile_probs(
        model, variables, tile, interval, hw, calib, backend="gemm",
        gemm_first_stage=split[0], gemm_first_block=split[1],
    )
    head = variables["params"]["fc_tile"]
    p = np.asarray(
        jax.jit(fn)(head, tree, jnp.asarray(imgs), None)
    ).ravel()

    from scipy.stats import spearmanr

    assert spearmanr(p_ref, p).statistic > 0.8
    assert np.abs(p - p_ref).max() < 0.05


@pytest.mark.parametrize("engine", ["q8d", "q8dg"])
def test_dense_noflip_graph_matches(engine, monkeypatch):
    """Host all-zero flip arrays dispatch the specialized flip-free graph
    (flip_codes=None: no selects, no whole-image reverse); its output must
    match the flax path on an unflipped batch."""
    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops import q8_trunk
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    monkeypatch.setattr(q8_trunk, "TILE_ALIGN", 32)

    tile, interval, hw, g = 32, 20, 150, 2
    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    coords = tile_grid(hw, hw, tile, interval)
    imgs = _structured_images(hw, g)
    flip0 = np.zeros((g,), np.int32)

    ref_fn = steps_mod.make_tile_infer_step(model, tile, coords)
    p_ref = np.asarray(
        ref_fn(variables, jnp.asarray(imgs), jnp.asarray(flip0))
    ).ravel()

    fn = steps_mod.make_tile_infer_step(
        model, tile, coords, variables=variables, engine=engine,
        calib_images=imgs,
    )
    p = np.asarray(fn(variables, jnp.asarray(imgs), flip0)).ravel()

    from scipy.stats import spearmanr

    assert spearmanr(p_ref, p).statistic > 0.8
    assert np.abs(p - p_ref).max() < 0.05


def test_mosaic_layer2_matches_per_tile_conv_land(monkeypatch):
    """CST_L2_MOSAIC: layer2 on gutter-packed canvases must be EXACT vs the
    per-tile conv-land plan — a per-tile 3×3 reads at most 1 px beyond the
    tile, and on the mosaic that px is a re-zeroed gutter, so every content
    dot product is identical (infer_engine._layer2_mosaic_q8). Compares the
    full q8dg probs mosaic-on vs mosaic-off (same calibration scales, same
    GEMM backend; only the layer2 conv formulation differs)."""
    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops import infer_engine, q8_trunk
    from cellsegmentation_tpu.ops.infer_engine import (
        calib_tiles_from_images, make_dense_tile_probs,
    )
    from cellsegmentation_tpu.ops.tiles import tile_grid

    monkeypatch.setattr(q8_trunk, "TILE_ALIGN", 32)

    tile, interval, hw, g = 32, 20, 150, 2
    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    coords = tile_grid(hw, hw, tile, interval)
    imgs = _structured_images(hw, g)
    calib = calib_tiles_from_images(imgs, coords, tile)
    head = variables["params"]["fc_tile"]

    ps = {}
    for mosaic in (False, True):
        monkeypatch.setattr(infer_engine, "_L2_MOSAIC", mosaic)
        fn, tree = make_dense_tile_probs(
            model, variables, tile, interval, hw, calib, backend="gemm",
        )
        ps[mosaic] = np.asarray(
            jax.jit(fn)(head, tree, jnp.asarray(imgs), None)
        ).ravel()

    # content dot products are identical; tiny diffs can only come from
    # bf16 accumulation order inside XLA's conv at the different spatial
    # size flipping an int8 quantization boundary
    np.testing.assert_allclose(ps[True], ps[False], rtol=0, atol=2e-2)
    assert np.abs(ps[True] - ps[False]).mean() < 2e-3
