"""Host→device batching with on-device augmentation + normalization.

The reference normalizes per item inside DataLoader workers with torchvision
transforms (reference: dataset/dataset.py:78-97). Here uint8 images cross
PCIe once per batch; flips and the ImageNet normalization run *on device* in
one fused jitted kernel — uint8 HBM traffic is 4× cheaper than f32 and the
VPU does the rest.

Static shapes: the last batch is padded up to full size and carries a
validity mask, so every step hits the same compiled program.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


import functools


@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_images(
    images_u8: jnp.ndarray, flip_codes: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """uint8 NHWC [B,H,W,3] + per-sample flip codes -> normalized images.

    flip code: 0 none, 1 horizontal, 2 vertical, 3 both — matching the
    reference's RandomHorizontalFlip(p=1)/Vertical/Compose augmentations
    (reference: dataset/dataset.py:70-77). torchvision hflip mirrors width.

    Flips run on the raw uint8 bytes and the ImageNet normalization is a
    single per-channel affine in the requested dtype, so no f32 copy of the
    pixel tensor ever exists when dtype=bfloat16 (the tile-inference hot
    path; the f32 default keeps training parity with the reference's
    torchvision pipeline).
    """
    do_h = ((flip_codes == 1) | (flip_codes == 3))[:, None, None, None]
    do_v = ((flip_codes == 2) | (flip_codes == 3))[:, None, None, None]
    x = jnp.where(do_h, images_u8[:, :, ::-1, :], images_u8)
    x = jnp.where(do_v, x[:, ::-1, :, :], x)
    scale = (1.0 / (255.0 * IMAGENET_STD)).astype(dtype)
    shift = (-IMAGENET_MEAN / IMAGENET_STD).astype(dtype)
    return x.astype(dtype) * scale + shift


class BatchIterator:
    """Yield fixed-shape batches of sample indices with padding masks.

    In multi-host SPMD each process would iterate its own contiguous shard of
    the epoch permutation (process_index/process_count), replacing the
    reference's DistributedSampler (reference: train_image.py:432-439).
    """

    def __init__(
        self,
        n_samples: int,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.n_samples = n_samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        order = (
            self._rng.permutation(self.n_samples)
            if self.shuffle
            else np.arange(self.n_samples)
        )
        self._epoch += 1
        shard = order[self.process_index :: self.process_count]
        # SPMD lockstep: every process must yield the SAME number of batches
        # or multi-host jit calls deadlock — pad ragged shards to the widest
        # shard length (ceil(n/pc)) with invalid rows
        target = -(-self.n_samples // self.process_count)
        valid_all = np.ones(target, dtype=bool)
        if len(shard) < target:
            valid_all[len(shard) :] = False
            shard = np.concatenate(
                [shard, np.zeros(target - len(shard), dtype=shard.dtype)]
            )
        bs = self.batch_size
        n_batches = target // bs if self.drop_last else -(-target // bs)
        for b in range(n_batches):
            sel = shard[b * bs : (b + 1) * bs]
            valid = valid_all[b * bs : (b + 1) * bs]
            if len(sel) < bs:
                pad = bs - len(sel)
                sel = np.concatenate([sel, np.zeros(pad, dtype=sel.dtype)])
                valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
            yield sel, valid

    def fast_forward(self, epochs: int) -> None:
        """Advance the shuffle stream as if ``epochs`` epochs had already been
        iterated, so a resumed run replays the exact permutation sequence the
        uninterrupted run would have seen from that epoch on."""
        for _ in range(epochs):
            if self.shuffle:
                self._rng.permutation(self.n_samples)
            self._epoch += 1

    def __len__(self) -> int:
        # uniform across processes (see SPMD-lockstep padding in __iter__)
        shard_len = -(-self.n_samples // self.process_count)
        if self.drop_last:
            return shard_len // self.batch_size
        return -(-shard_len // self.batch_size)
