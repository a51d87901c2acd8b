"""Unit tests for the ops layer against reference oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu import ops
from tests.reference_oracles import (
    categorize_oracle,
    get_tiles_oracle,
    qwk_oracle,
    topk_select_oracle,
)


class TestTileGrid:
    @pytest.mark.parametrize(
        "h,w,size,interval",
        [(299, 299, 32, 20), (299, 299, 16, 5), (299, 299, 32, 32), (64, 64, 16, 8)],
    )
    def test_matches_reference_order(self, h, w, size, interval):
        got = ops.tile_grid(h, w, size, interval)
        want = np.asarray(get_tiles_oracle(h, w, interval, size))
        np.testing.assert_array_equal(got, want)

    def test_known_counts(self):
        # 299/32/20 -> 15 starts per axis; 299/16/5 -> 58 per axis (SURVEY §5.7)
        assert ops.num_tiles(299, 299, 32, 20) == 15 * 15
        assert ops.num_tiles(299, 299, 16, 5) == 58 * 58

    def test_extract_tiles_values(self, rng):
        images = rng.integers(0, 255, size=(3, 40, 40, 3), dtype=np.uint8)
        grid = ops.tile_grid(40, 40, 16, 8)
        tiles = np.asarray(ops.extract_tiles(jnp.asarray(images), grid, 16))
        assert tiles.shape == (3, len(grid), 16, 16, 3)
        for b in [0, 2]:
            for t, (x, y) in enumerate(grid):
                np.testing.assert_array_equal(
                    tiles[b, t], images[b, x : x + 16, y : y + 16]
                )


class TestCategorize:
    def test_matches_reference(self):
        xs = np.asarray([0, 1, 3, 5, 6, 10, 11, 20, 21, 50, 51, 200, 201, 5000])
        want = [categorize_oracle(int(x)) for x in xs]
        np.testing.assert_array_equal(np.asarray(ops.categorize(jnp.asarray(xs))), want)
        np.testing.assert_array_equal(ops.categorize_np(xs), want)

    def test_decategorize_roundtrip(self):
        labels = jnp.arange(7)
        mins, maxs = ops.de_categorize(labels)
        np.testing.assert_array_equal(np.asarray(mins), [0, 1, 6, 11, 21, 51, 201])
        np.testing.assert_array_equal(
            np.asarray(maxs), [0, 5, 10, 20, 50, 200, 100000]
        )
        # every bin edge categorizes back into its own bin
        for lab in range(7):
            assert categorize_oracle(int(mins[lab])) == lab
            if lab < 6:
                assert categorize_oracle(int(maxs[lab])) == lab


class TestAdaptiveTopK:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("tiles_per_pos,topk_neg", [(1, 3), (2, 5)])
    def test_matches_lexsort_trick(self, seed, tiles_per_pos, topk_neg):
        rng = np.random.default_rng(seed)
        n_img, n_tiles = 6, 25
        probs = rng.random((n_img, n_tiles)).astype(np.float32)
        labels = rng.integers(0, 8, size=n_img)
        labels[0] = 0  # force at least one negative image

        groups = np.repeat(np.arange(n_img), n_tiles)
        want = topk_select_oracle(
            probs.reshape(-1), groups, labels, tiles_per_pos, topk_neg
        ).reshape(n_img, n_tiles)

        got = np.asarray(
            ops.adaptive_topk_mask(
                jnp.asarray(probs), jnp.asarray(labels), tiles_per_pos, topk_neg
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_ties_match_reference(self):
        # equal probs: reference's stable ascending lexsort keeps the
        # later-index tiles in the top-k (two groups so the modular trick
        # behaves — see test_single_group_edge_case for the 1-image quirk)
        probs = np.zeros((2, 6), dtype=np.float32)
        labels = np.asarray([2, 3])
        groups = np.repeat(np.arange(2), 6)
        want = topk_select_oracle(probs.reshape(-1), groups, labels, 1, 3).reshape(2, 6)
        got = np.asarray(
            ops.adaptive_topk_mask(jnp.asarray(probs), jnp.asarray(labels), 1, 3)
        )
        np.testing.assert_array_equal(got, want)

    def test_single_group_edge_case(self):
        # With exactly one image the reference's `(i+topk) % len` trick never
        # leaves the group and selects NOTHING (reference: inference.py:38-40)
        # — a degenerate artifact, not intent. We deliberately do plain top-k.
        probs = np.asarray([[0.1, 0.5, 0.3, 0.2]], dtype=np.float32)
        ref = topk_select_oracle(
            probs.reshape(-1), np.zeros(4, dtype=int), np.asarray([2]), 1, 3
        )
        assert not ref.any()  # the reference quirk
        got = np.asarray(
            ops.adaptive_topk_mask(jnp.asarray(probs), jnp.asarray([2]), 1, 3)
        )
        assert got.sum() == 2  # ours: the 2 highest-prob tiles
        np.testing.assert_array_equal(got, [[False, True, True, False]])

    def test_k_exceeds_tiles(self):
        probs = np.random.default_rng(0).random((2, 4)).astype(np.float32)
        labels = np.asarray([300, 0])  # 300 * 1 > 4 tiles
        got = np.asarray(
            ops.adaptive_topk_mask(jnp.asarray(probs), jnp.asarray(labels), 1, 2)
        )
        assert got[0].all()  # the whole positive image is selected
        assert got[1].sum() == 2

    def test_valid_mask_excludes_padding(self):
        probs = np.asarray([[0.9, 0.8, 0.7, 0.6]], dtype=np.float32)
        valid = np.asarray([[True, True, False, False]])
        got = np.asarray(
            ops.adaptive_topk_mask(
                jnp.asarray(probs), jnp.asarray([5]), 1, 2, valid=jnp.asarray(valid)
            )
        )
        np.testing.assert_array_equal(got, [[True, True, False, False]])


class TestQWK:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_host_matches_reference(self, seed):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 7, size=500)
        b = np.clip(a + rng.integers(-1, 2, size=500), 0, 6)
        assert ops.quadratic_weighted_kappa(a, b) == pytest.approx(qwk_oracle(a, b))

    def test_device_matches_host(self, rng):
        a = rng.integers(0, 7, size=512)
        b = np.clip(a + rng.integers(-2, 3, size=512), 0, 6)
        got = float(ops.qwk_device(jnp.asarray(a), jnp.asarray(b), 7))
        want = ops.quadratic_weighted_kappa(a, b, 0, 6)
        assert got == pytest.approx(want, abs=1e-5)

    def test_perfect_agreement(self):
        a = np.asarray([0, 1, 2, 3, 4, 5, 6])
        assert ops.quadratic_weighted_kappa(a, a) == pytest.approx(1.0)


class TestLosses:
    def test_weighted_mse_reference_quirk(self):
        # weights: raw target below 20, ln(target) at/above 20
        inputs = jnp.asarray([1.0, 25.0, 3.0])
        targets = jnp.asarray([2.0, 20.0, 3.0])
        want = np.mean(
            np.asarray([2.0, np.log(20.0), 3.0])
            * (np.asarray([1.0, 25.0, 3.0]) - np.asarray([2.0, 20.0, 3.0])) ** 2
        )
        assert float(ops.weighted_mse(inputs, targets)) == pytest.approx(want, rel=1e-5)

    def test_dice_flat_vs_batch(self, rng):
        x = rng.random((4, 100)).astype(np.float32)
        y = (rng.random((4, 100)) > 0.5).astype(np.float32)
        batch = np.asarray(ops.dice_coef(jnp.asarray(x)[:, :, None], jnp.asarray(y)[:, :, None]))
        assert batch.shape == (4,)
        flat = float(ops.dice_coef(jnp.asarray(x), jnp.asarray(y)))
        a = (x * y).sum()
        want = (2 * a + 1e-6) / ((x * x).sum() + (y * y).sum() + 1e-6)
        assert flat == pytest.approx(want, rel=1e-5)

    def test_cross_entropy_matches_manual(self, rng):
        logits = rng.normal(size=(8, 7)).astype(np.float32)
        labels = rng.integers(0, 7, size=8)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = -np.mean(np.log(p[np.arange(8), labels]))
        got = float(ops.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-5)


class TestResize:
    def test_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 10, 10, 3)).astype(np.float32)
        for out in [19, 38, 7, 1]:
            want = (
                F.interpolate(
                    torch.from_numpy(x).permute(0, 3, 1, 2),
                    size=out,
                    mode="bilinear",
                    align_corners=True,
                )
                .permute(0, 2, 3, 1)
                .numpy()
            )
            got = np.asarray(ops.resize_bilinear_align_corners(jnp.asarray(x), out, out))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestHSV:
    def test_value_channel_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        want = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))[2]
        got = np.asarray(ops.rgb_value_channel(jnp.asarray(img)))
        np.testing.assert_array_equal(got, want)

    def test_refine_matches_cv2_pipeline(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        mask = (rng.random((32, 32)) > 0.5).astype(np.uint8)
        img_split = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        _, mask_hsv = cv2.threshold(img_split[2], 170, 255, cv2.THRESH_BINARY)
        want = np.logical_and(mask, (1 - mask_hsv / 255).astype(bool))
        got = np.asarray(ops.hsv_refine_mask(jnp.asarray(img), jnp.asarray(mask)))
        np.testing.assert_array_equal(got, want)


class TestPooling:
    def test_avg_plus_max(self, rng):
        x = rng.normal(size=(2, 5, 5, 8)).astype(np.float32)
        got = np.asarray(ops.global_avg_max_pool(jnp.asarray(x)))
        want = x.mean(axis=(1, 2)) + x.max(axis=(1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eight_virtual_devices():
    assert jax.device_count() == 8
