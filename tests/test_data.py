"""Data layer tests: h5 loading, k-fold split, augmentation, batching."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.data import (
    BatchIterator,
    LystoDataSource,
    LystoTestSource,
    make_synthetic_h5,
    normalize_images,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


@pytest.fixture(scope="module")
def h5file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "training.h5")
    arrays = make_synthetic_h5(path, n_images=30, image_size=64, seed=1)
    return path, arrays


class TestLystoDataSource:
    def test_kfold_split_rule(self, h5file):
        path, arrays = h5file
        train = LystoDataSource(path, train=True, kfold=10)
        val = LystoDataSource(path, train=False, kfold=10)
        # reference rule: i with (i+1)%kfold==0 goes to validation
        # (reference: dataset/dataset.py:110-112)
        val_ids = [i for i in range(30) if (i + 1) % 10 == 0]
        assert len(val) == len(val_ids)
        assert len(train) == 30 - len(val_ids)
        np.testing.assert_array_equal(val.labels, arrays["counts"][val_ids])

    def test_augment_quadruples_samples(self, h5file):
        path, _ = h5file
        plain = LystoDataSource(path, train=True, kfold=10)
        aug = LystoDataSource(path, train=True, kfold=10, augment=True)
        assert len(aug) == 4 * len(plain)
        # but images are stored once
        assert aug.images.shape == plain.images.shape
        assert set(np.unique(aug.flip_code)) == {0, 1, 2, 3}

    def test_organ_filter(self, h5file):
        path, _ = h5file
        src = LystoDataSource(path, train=True, kfold=None, organ="colon")
        assert all(o.partition("_")[0] == "colon" for o in src.organs)
        assert len(src) > 0

    def test_cls_labels(self, h5file):
        path, _ = h5file
        src = LystoDataSource(path, train=True, kfold=10)
        assert src.cls_labels.min() >= 0 and src.cls_labels.max() <= 6

    def test_resampling(self, h5file):
        path, _ = h5file
        src = LystoDataSource(path, train=True, kfold=10)
        n0 = len(src)
        src.random_delete(5)
        assert len(src) == n0 - 5
        src.add_samples([0, 1, 2])
        assert len(src) == n0 - 2

    def test_testsource_ids(self, h5file):
        path, _ = h5file
        src = LystoTestSource(path)
        np.testing.assert_array_equal(src.ids, np.arange(30) + 1)


class TestNormalize:
    def test_matches_torchvision_pipeline(self, h5file):
        """ToTensor + Normalize + flips parity (reference: dataset.py:70-97)."""
        path, arrays = h5file
        img = arrays["images"][:1]  # [1,H,W,3] uint8
        for code, (fh, fv) in enumerate(
            [(False, False), (True, False), (False, True), (True, True)]
        ):
            got = np.asarray(
                normalize_images(jnp.asarray(img), jnp.asarray([code]))
            )[0]
            want = img[0].astype(np.float32) / 255.0
            if fh:
                want = want[:, ::-1]
            if fv:
                want = want[::-1]
            want = (want - IMAGENET_MEAN) / IMAGENET_STD
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestBatchIterator:
    def test_padding_and_masks(self):
        it = BatchIterator(10, 4, shuffle=False)
        batches = list(it)
        assert len(batches) == 3
        sel, valid = batches[-1]
        assert sel.shape == (4,) and valid.sum() == 2

    def test_shuffle_changes_between_epochs(self):
        it = BatchIterator(100, 10, shuffle=True, seed=0)
        first = np.concatenate([s for s, _ in it])
        second = np.concatenate([s for s, _ in it])
        assert not np.array_equal(first, second)
        np.testing.assert_array_equal(np.sort(first), np.arange(100))

    def test_host_sharding_partition(self):
        # two processes see disjoint, complete shards
        a = BatchIterator(20, 4, shuffle=False, process_index=0, process_count=2)
        b = BatchIterator(20, 4, shuffle=False, process_index=1, process_count=2)
        ai = np.concatenate([s[v] for s, v in a])
        bi = np.concatenate([s[v] for s, v in b])
        assert len(np.intersect1d(ai, bi)) == 0
        np.testing.assert_array_equal(np.sort(np.concatenate([ai, bi])), np.arange(20))
