"""Inference/eval semantics against reference oracles: cls_limit clamping,
pos/neg-ratio pruning, tile-eval GT reconstruction."""

import numpy as np
import pytest

from cellsegmentation_tpu import evaluate as eval_mod
from cellsegmentation_tpu.infer import apply_cls_limit, sample_topk
from cellsegmentation_tpu.ops.categorize import categorize_np, de_categorize_np
from tests.reference_oracles import categorize_oracle


class TestClsLimit:
    def test_matches_reference_semantics(self):
        """reference: inference.py:78-86 — counts whose bin exceeds the
        predicted class snap to the class max; below, to the class min."""
        counts = np.asarray([0, 3, 7, 30, 300, 12, 55])
        cats = np.asarray([1, 1, 1, 2, 2, 5, 5])
        got = apply_cls_limit(counts, cats)
        want = []
        for x, c in zip(counts, cats):
            lo, hi = de_categorize_np(np.asarray([c]))
            if categorize_oracle(int(x)) > c:
                want.append(int(hi[0]))
            elif categorize_oracle(int(x)) < c:
                want.append(int(lo[0]))
            else:
                want.append(int(x))
        np.testing.assert_array_equal(got, want)

    def test_agreeing_counts_unchanged(self):
        counts = np.asarray([0, 3, 8, 15, 30, 100, 250])
        cats = categorize_np(counts)
        np.testing.assert_array_equal(apply_cls_limit(counts, cats), counts)


class _FakeSource:
    """Minimal LystoDataSource stand-in for sampling tests."""

    def __init__(self, n, hw, labels):
        self.images = np.zeros((n, hw, hw, 3), np.uint8)
        self.base_idx = np.arange(n)
        self.flip_code = np.zeros(n, np.int32)
        self.labels = np.asarray(labels)

    @property
    def image_hw(self):
        return self.images.shape[1], self.images.shape[2]

    def __len__(self):
        return len(self.base_idx)


class TestSampleTopK:
    def test_selection_counts(self, rng):
        src = _FakeSource(6, 48, [0, 3, 0, 7, 1, 0])
        # grid 48/16/16 -> 3x3 = 9 tiles per image
        probs = rng.random((6, 9)).astype(np.float32)
        data = sample_topk(src, probs, 16, 16, tiles_per_pos=1, topk_neg=4,
                           pos_neg_ratio=None)
        # pos images contribute min(label, 9); neg contribute 4
        want_pos = 3 + 7 + 1
        want_neg = 3 * 4
        assert data["n_pos"] == want_pos
        assert data["n_neg"] == want_neg
        assert len(data["label"]) == want_pos + want_neg

    def test_ratio_pruning(self, rng):
        """reference: dataset/dataset.py:176-199 — the majority side is cut
        to int(minority * ratio) (pos) or int(minority / ratio) (neg)."""
        src = _FakeSource(4, 48, [9, 9, 9, 0])
        probs = rng.random((4, 9)).astype(np.float32)
        data = sample_topk(src, probs, 16, 16, tiles_per_pos=1, topk_neg=2,
                           pos_neg_ratio=0.5)
        # raw: pos=27, neg=2 -> pos pruned to int(2*0.5)=1
        assert data["n_neg"] == 2
        assert data["n_pos"] == 1

    def test_selected_tiles_are_top_prob(self, rng):
        src = _FakeSource(2, 48, [2, 0])
        probs = rng.random((2, 9)).astype(np.float32)
        data = sample_topk(src, probs, 16, 16, tiles_per_pos=1, topk_neg=3,
                           pos_neg_ratio=None)
        from cellsegmentation_tpu.ops.tiles import tile_grid

        coords = tile_grid(48, 48, 16, 16)
        # image 0: its 2 selected tiles must be its top-2 probs
        sel0 = [(x, y) for i, (x, y) in enumerate(zip(data["xs"], data["ys"]))
                if data["img_idx"][i] == 0]
        top2 = {tuple(coords[t]) for t in np.argsort(probs[0])[-2:]}
        assert {tuple(t) for t in sel0} == top2


class TestEvaluateTile:
    def test_matches_reference_reconstruction(self, rng):
        """reference: evaluate.py:8-27 — GT marks each image's top
        count*tiles_per_pos tiles positive, preds threshold the probs."""
        labels = np.asarray([0, 2, 5])
        probs = rng.random((3, 10)).astype(np.float32)
        err, fpr, fnr = eval_mod.evaluate_tile(labels, probs, 1, threshold=0.5)

        # oracle
        gt = np.zeros((3, 10))
        for i, lab in enumerate(labels):
            if lab:
                top = np.argsort(probs[i], kind="stable")[-lab:]
                gt[i, top] = 1
        pred = (probs > 0.5).astype(int)
        neq = pred != gt
        want_err = neq.sum() / neq.size
        want_fpr = (pred[gt == 0] == 1).sum() / (gt == 0).sum()
        want_fnr = (pred[gt == 1] == 0).sum() / (gt == 1).sum()
        assert err == pytest.approx(want_err)
        assert fpr == pytest.approx(want_fpr)
        assert fnr == pytest.approx(want_fnr)


class TestEvaluateImage:
    def test_mse_and_qwk(self):
        labels = np.asarray([0, 5, 10, 20])
        counts = np.asarray([1, 5, 8, 25])
        m, mse, qwk = eval_mod.evaluate_image(labels, None, counts)
        assert m == 0.0  # reference mAP placeholder
        assert mse == pytest.approx(np.mean((counts - labels) ** 2.0))
        assert -1 <= qwk <= 1

    def test_diverged_counts_do_not_crash_qwk(self):
        """QWK sizes its confusion matrix by max(count)² — a diverged
        regressor emitting a huge count must be clipped eval-side, not
        allocate terabytes; MSE still carries the divergence unclipped."""
        labels = np.asarray([0, 5, 10, 20])
        counts = np.asarray([1, 5, 8, 10**6])
        m, mse, qwk = eval_mod.evaluate_image(labels, None, counts)
        assert mse > 1e10  # unclipped signal
        assert -1 <= qwk <= 1


def test_calc_map_smoke():
    from cellsegmentation_tpu.ops.metrics import calc_map

    pred = np.asarray([1, 0, 1, 1])
    scores = np.asarray([0.9, 0.1, 0.8, 0.7])
    assert 0 <= calc_map(pred, scores) <= 1


class TestFusedSweep:
    """inference_tiles_and_counts ≡ inference_tiles + inference_image[1],
    including the 2-deep pipelined drain order, uneven final batch, and
    diverged-regressor clamping."""

    def _source(self, rng, n=7, hw=36):
        src = _FakeSource(n, hw, labels=rng.integers(0, 5, n))
        src.images = rng.integers(0, 255, size=(n, hw, hw, 3), dtype=np.uint8)
        src.flip_code = rng.integers(0, 4, n).astype(np.int32)
        return src

    def test_matches_unfused(self, rng):
        from cellsegmentation_tpu import infer

        src = self._source(rng)
        n_t = 9

        def tile_step(variables, images, flip):
            imgs = np.asarray(images, np.float64)
            return (imgs.mean(axis=(1, 2, 3))[:, None]
                    + np.arange(n_t)[None, :]).astype(np.float32)

        def image_step(variables, images, flip):
            imgs = np.asarray(images, np.float64)
            m = imgs.mean(axis=(1, 2, 3))
            regs = m.copy()
            regs[0] = np.nan  # exercise the diverged-count clamp
            return np.stack([m, -m], axis=1), regs

        probs, counts = infer.inference_tiles_and_counts(
            src, tile_step, image_step, None, 16, 10, image_batch=2
        )
        want_probs = infer.inference_tiles(
            src, tile_step, None, 16, 10, image_batch=2
        )
        _, want_counts = infer.inference_image(
            src, image_step, None, batch_size=2
        )
        np.testing.assert_array_equal(probs, want_probs)
        np.testing.assert_array_equal(counts, want_counts)
        assert counts[0] == 0  # nan reg -> clamped to 0

    def test_single_upload_per_batch(self, rng):
        """The fused loop must convert each image batch to a device array
        once and hand the SAME object to both steps."""
        from cellsegmentation_tpu import infer

        src = self._source(rng, n=4)
        seen = []

        def tile_step(variables, images, flip):
            seen.append(("tile", id(images)))
            return np.zeros((np.asarray(images).shape[0], 9), np.float32)

        def image_step(variables, images, flip):
            seen.append(("image", id(images)))
            n = np.asarray(images).shape[0]
            return np.zeros((n, 2), np.float32), np.zeros(n, np.float32)

        infer.inference_tiles_and_counts(
            src, tile_step, image_step, None, 16, 10, image_batch=2
        )
        tile_ids = [i for k, i in seen if k == "tile"]
        image_ids = [i for k, i in seen if k == "image"]
        assert tile_ids == image_ids, "image batch uploaded twice"
