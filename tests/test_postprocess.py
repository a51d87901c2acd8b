"""Postprocess tests: native morphology vs SciPy oracle, mask painting,
HSV refinement pipeline, heatmaps."""

import numpy as np
import pytest

from cellsegmentation_tpu.native.build import load_native
from cellsegmentation_tpu.postprocess import (
    generate_masks,
    preprocess_masks,
    remove_small_holes,
    remove_small_objects,
    remove_small_regions_batch,
)
from cellsegmentation_tpu.postprocess.masks import paint_tile_blocks


def _scipy_remove_small_objects(mask, min_size, connectivity=1):
    from scipy import ndimage

    structure = ndimage.generate_binary_structure(2, connectivity)
    labels, n = ndimage.label(mask, structure=structure)
    areas = np.bincount(labels.reshape(-1))
    keep = areas >= min_size
    keep[0] = False
    return keep[labels]


def _scipy_remove_small_holes(mask, area_threshold, connectivity=1):
    return ~_scipy_remove_small_objects(~mask.astype(bool), area_threshold, connectivity)


class TestNativeMorphology:
    def test_native_library_builds(self):
        assert load_native() is not None, "C++ morphology failed to build"

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("min_size", [1, 5, 30, 400])
    def test_objects_match_scipy(self, seed, min_size):
        rng = np.random.default_rng(seed)
        mask = rng.random((64, 64)) > 0.6
        got = remove_small_objects(mask, min_size)
        want = _scipy_remove_small_objects(mask, min_size)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("thresh", [1, 6, 25, 120])
    def test_holes_match_scipy(self, seed, thresh):
        rng = np.random.default_rng(seed)
        mask = rng.random((64, 64)) > 0.35
        got = remove_small_holes(mask, thresh)
        want = _scipy_remove_small_holes(mask, thresh)
        np.testing.assert_array_equal(got, want)

    def test_batch_matches_sequential(self, rng):
        masks = rng.random((5, 48, 48)) > 0.55
        got = remove_small_regions_batch(masks, 20, 10)
        for i in range(5):
            want = remove_small_holes(remove_small_objects(masks[i], 20), 10)
            np.testing.assert_array_equal(got[i], want)

    def test_connectivity_semantics(self):
        # two diagonal pixels: separate under 4-conn, one object under 8-conn
        mask = np.zeros((8, 8), dtype=bool)
        mask[2, 2] = mask[3, 3] = True
        assert not remove_small_objects(mask, 2, connectivity=1).any()
        assert remove_small_objects(mask, 2, connectivity=2).sum() == 2


class TestPaintTileBlocks:
    def test_matches_blockwise_loop(self, rng):
        # oracle: the reference's per-tile block writes
        # (utils/image_processing.py:93-98)
        n, h, w, ts = 3, 40, 40, 8
        groups = rng.integers(0, n, size=20)
        xy = rng.integers(0, h - ts + 1, size=(20, 2))
        want = np.zeros((n, h, w), dtype=bool)
        for g, (x, y) in zip(groups, xy):
            want[g, x : x + ts, y : y + ts] = True
        got = paint_tile_blocks(n, (h, w), groups, xy, ts)
        np.testing.assert_array_equal(got, want)

    def test_overlapping_tiles(self):
        got = paint_tile_blocks(
            1, (10, 10), np.zeros(2, dtype=int), np.asarray([[0, 0], [2, 2]]), 4
        )
        want = np.zeros((1, 10, 10), dtype=bool)
        want[0, 0:4, 0:4] = True
        want[0, 2:6, 2:6] = True
        np.testing.assert_array_equal(got, want)


class TestPreprocessMasks:
    def test_matches_cv2_reference_pipeline(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        mask = (rng.random((64, 64)) > 0.3).astype(np.uint8)
        # oracle: reference pipeline with scipy morphology
        img_split = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        _, mask_hsv = cv2.threshold(img_split[2], 170, 255, cv2.THRESH_BINARY)
        want = np.logical_and(mask, (1 - mask_hsv / 255).astype(bool))
        want = _scipy_remove_small_holes(
            _scipy_remove_small_objects(want, 400), 120
        )
        got = preprocess_masks(img, mask)
        np.testing.assert_array_equal(got, want)


class TestGenerateMasks:
    def test_saves_pngs(self, rng, tmp_path):
        pytest.importorskip("cv2")
        images = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
        groups = np.asarray([0, 1, 1])
        xy = np.asarray([[0, 0], [8, 8], [16, 0]])
        masks = generate_masks(
            images, groups, xy, 8, save_masks=True, output_path=str(tmp_path)
        )
        assert masks.shape == (2, 32, 32)
        assert (tmp_path / "rgb" / "00001.png").exists()
        assert (tmp_path / "mask" / "00002.png").exists()
        import cv2

        saved = cv2.imread(str(tmp_path / "mask" / "00001.png"), cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(saved > 127, masks[0] > 0)
