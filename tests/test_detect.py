"""Detection tests: vectorized mean-shift vs cv2 oracle, point matching."""

import numpy as np
import pytest

from cellsegmentation_tpu.detect import (
    AverageMeter,
    MetricGroup,
    get_prf1,
    meanshift_cluster,
    vectorized_meanshift,
)


def _blob_mask(h, w, centers, radius=6, amp=255):
    yy, xx = np.mgrid[0:h, 0:w]
    mask = np.zeros((h, w), dtype=np.float64)
    for cy, cx in centers:
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        mask = np.maximum(mask, amp * np.exp(-d2 / (2 * radius**2)))
    return mask.astype(np.uint8)


class TestVectorizedMeanshift:
    def test_converges_to_blob_centers(self):
        mask = _blob_mask(100, 100, [(30, 30), (70, 60)])
        seeds = np.asarray([[20, 20], [25, 35], [60, 55], [75, 65]])
        centers = vectorized_meanshift(mask, seeds, window_size=16)
        # each seed should land near its blob center
        for c in centers[:2]:
            assert np.linalg.norm(c - [30, 30]) < 4
        for c in centers[2:]:
            assert np.linalg.norm(c - [70, 60]) < 4

    def test_matches_cv2_meanshift(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        mask = _blob_mask(80, 80, [(25, 40), (55, 20)])
        seeds = rng.integers(0, 64, size=(12, 2))
        ours = vectorized_meanshift(mask, seeds, window_size=16)
        crit = (cv2.TERM_CRITERIA_EPS, 0, 0.00001)
        for k, (x, y) in enumerate(seeds):
            x = int(np.clip(x, 0, 64)); y = int(np.clip(y, 0, 64))
            _, (wy, wx, _, _) = cv2.meanShift(mask, (y, x, 16, 16), crit)
            want = np.asarray([wx + 8, wy + 8])
            # integer rounding inside cv2 differs by ≤2 px from our centroid
            assert np.linalg.norm(ours[k] - want) <= 3, (k, ours[k], want)

    def test_zero_mass_windows_stay(self):
        mask = np.zeros((50, 50), dtype=np.uint8)
        seeds = np.asarray([[10, 10]])
        centers = vectorized_meanshift(mask, seeds, window_size=16)
        np.testing.assert_array_equal(centers, [[18, 18]])  # center of the box


class TestMeanshiftCluster:
    def test_finds_and_caps_cells(self):
        pytest.importorskip("cv2")
        pytest.importorskip("sklearn")
        mask = _blob_mask(150, 150, [(40, 40), (100, 110), (110, 40)])
        kept, discarded = meanshift_cluster(mask, "gaussianblur", cell_count=2)
        assert len(kept) == 2
        assert len(discarded) >= 1
        all_pts = np.concatenate([kept, discarded])
        # every reported center near a true blob
        for p in all_pts:
            dists = [np.linalg.norm(p - c) for c in [(40, 40), (100, 110), (110, 40)]]
            assert min(dists) < 10

    def test_empty_mask(self):
        pytest.importorskip("cv2")
        kept, discarded = meanshift_cluster(
            np.zeros((100, 100), dtype=np.uint8), "gaussianblur", cell_count=5
        )
        assert len(kept) == 0 and len(discarded) == 0

    def test_distance_transform_method(self):
        cv2 = pytest.importorskip("cv2")
        mask = _blob_mask(100, 100, [(50, 50)], radius=10)
        kept, _ = meanshift_cluster(
            mask, "distancetransform", cell_count=1,
            distanceType=cv2.DIST_L2, maskSize=5,
        )
        assert len(kept) == 1
        assert np.linalg.norm(kept[0] - [50, 50]) < 8


class TestPointMatching:
    def test_perfect_match(self):
        pts = np.asarray([[10, 10], [50, 50]])
        p, r, f1, tp, fp, fn = get_prf1(pts, pts)
        assert (p, r, f1) == (1, 1, 1) and (tp, fp, fn) == (2, 0, 0)

    def test_radius_boundary(self):
        gt = np.asarray([[100, 100]])
        p, r, f1, tp, fp, fn = get_prf1(np.asarray([[100, 116]]), gt)
        assert tp == 1  # exactly 16 px counts (<=)
        p, r, f1, tp, fp, fn = get_prf1(np.asarray([[100, 117]]), gt)
        assert tp == 0 and fp == 1 and fn == 1

    def test_greedy_no_double_claim(self):
        gt = np.asarray([[0, 0]])
        pred = np.asarray([[0, 1], [1, 0]])
        p, r, f1, tp, fp, fn = get_prf1(pred, gt)
        assert tp == 1 and fp == 1 and fn == 0

    def test_empty_conventions(self):
        p, r, f1, tp, fp, fn = get_prf1(np.zeros((0, 2)), np.zeros((0, 2)))
        assert p == 1 and r == 1  # reference empty-set convention
        assert f1 == 1


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0 and m.val == 3.0

    def test_metric_group(self):
        g = MetricGroup()
        g.update([1, 0.5, 0.6, 0.9])
        g.update([0, 0.5, 0.4, 0.7])
        assert g.avg() == (0.5, 0.5, 0.5, pytest.approx(0.8))
