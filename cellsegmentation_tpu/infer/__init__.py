"""Batched inference orchestration + the stage-2 sampling cycle.

Host loops around the jitted steps in train/steps.py. Device→host traffic is
minimal: per-image scalars for stage 1, one [N, T] prob matrix for stage 2
(the tile *images* never leave the device), soft masks for stage 3.

Every loop runs a 2-deep software pipeline: batch i+1's upload + compute is
dispatched (async in JAX) before batch i's results are fetched, so the
device→host fetch of one batch hides behind the device compute of the next.
On a tunneled single chip the blocking fetch dominated the loop body
(docs/PERF.md stage-3 decomposition); on production TPU it simply keeps the
device queue non-empty.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu.data.batches import BatchIterator
from cellsegmentation_tpu.data.lysto import LystoDataSource
from cellsegmentation_tpu.parallel import multihost
from cellsegmentation_tpu.ops.categorize import categorize_np, de_categorize_np
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.ops.topk import adaptive_topk_mask


def _clean_counts(regs: np.ndarray) -> np.ndarray:
    """Round regressed counts with diverged-value (nan/inf/absurd) clamping."""
    return np.round(
        np.nan_to_num(regs, nan=0.0, posinf=1e6, neginf=0.0)
    ).clip(0, 1e6).astype(np.int64)


def _pipeline2(items, dispatch):
    """The 2-deep software pipeline shared by every host loop here: yields
    (item, dispatch(item)) one batch BEHIND the dispatch order, so the
    consumer's blocking device→host fetch of batch i overlaps batch i+1's
    upload + device compute (all async in JAX until fetched). The final
    pending batch is flushed by the generator itself — consumers cannot
    forget it."""
    pending = None
    for item in items:
        res = dispatch(item)
        if pending is not None:
            yield pending
        pending = (item, res)
    if pending is not None:
        yield pending


def apply_cls_limit(counts: np.ndarray, categories: np.ndarray) -> np.ndarray:
    """Clamp regressed counts into the predicted class's count range
    (reference: inference.py:78-86): if the count's bin exceeds the predicted
    class, snap to the class's max; if below, snap to its min."""
    counts = counts.astype(np.int64).copy()
    cat_of_count = categorize_np(counts)
    lo, hi = de_categorize_np(categories)
    counts = np.where(cat_of_count > categories, hi, counts)
    counts = np.where(cat_of_count < categories, lo, counts)
    return counts


def inference_image(
    source,
    infer_step,
    variables,
    batch_size: int = 64,
    cls_limit: bool = False,
    heads: str = "both",  # "both" | "cls" | "reg"
):
    """Run the image counter over a data source.

    Returns (categories [N], counts [N]) like the reference's
    inference_image (reference: inference.py:46-95); single-head variants
    return only their output (:98-137).

    ``infer_step`` must be PROCESS-LOCAL (a plain jit, no mesh/shard_map):
    batches are round-robined across processes (multihost.my_batches), so a
    collective-bearing step would launch different computations per process
    and deadlock. Mesh-sharded sweeps go through the trainers' stack-resident
    paths instead.
    """
    n = len(source)
    flip = getattr(source, "flip_code", np.zeros(n, dtype=np.int32))
    base_idx = getattr(source, "base_idx", np.arange(n))

    categories = np.zeros(n, dtype=np.int64)
    counts = np.zeros(n, dtype=np.int64)
    batches = list(BatchIterator(n, batch_size, shuffle=False))
    idx_chunks, cat_chunks, cnt_chunks = [], [], []

    def dispatch(sv):
        sel, valid = sv
        images = source.images[base_idx[sel]]
        return infer_step(variables, jnp.asarray(images), jnp.asarray(flip[sel]))

    mine = (batches[b] for b in multihost.my_batches(len(batches)))
    for (sel, valid), (d_probs, d_regs) in _pipeline2(mine, dispatch):
        keep = sel[valid]
        cat = np.asarray(d_probs).argmax(axis=1)[valid]
        # a diverged regressor (nan/inf/absurd counts) must not poison the
        # downstream eval: QWK sizes its confusion matrix by max(count), so
        # an unclamped cast here turns one bad batch into a crash. 10^6 is
        # far past any LYSTO count (top bin: >200) — sane paths unchanged.
        cnt = _clean_counts(np.asarray(d_regs)[valid])
        categories[keep] = cat
        counts[keep] = cnt
        idx_chunks.append(keep)
        cat_chunks.append(cat)
        cnt_chunks.append(cnt)
    multihost.merge_process_rows(
        [categories, counts], idx_chunks, [cat_chunks, cnt_chunks]
    )

    if cls_limit:
        counts = apply_cls_limit(counts, categories)
    if heads == "cls":
        return categories
    if heads == "reg":
        return counts
    return categories, counts


def inference_tiles(
    source,
    infer_step,
    variables,
    tile_size: int,
    interval: int,
    image_batch: int = 64,
) -> np.ndarray:
    """Dense per-tile P(positive) for every image: returns [N, T] float32.

    ``infer_step`` must be built with the matching static grid
    (steps.make_tile_infer_step(model, tile_size, tile_grid(...))). The
    flattened, reference-order equivalent of inference_tiles
    (reference: inference.py:9-28) is ``probs.reshape(-1)`` since all images
    share the static grid.

    ``infer_step`` must be PROCESS-LOCAL (a plain jit, no mesh/shard_map):
    batches are round-robined across processes (multihost.my_batches), so a
    collective-bearing step (e.g. make_stack_tile_infer_step output) would
    launch different computations per process and deadlock.
    """
    h, w = source.image_hw
    n_t = tile_grid(h, w, tile_size, interval).shape[0]
    n = len(source)
    flip = getattr(source, "flip_code", np.zeros(n, dtype=np.int32))
    base_idx = getattr(source, "base_idx", np.arange(n))

    out = np.zeros((n, n_t), dtype=np.float32)
    it = BatchIterator(n, image_batch, shuffle=False)
    batches = list(it)
    # disjoint sweep coverage at multi-host: each process computes a
    # round-robin subset of batches and the row fills are merged after
    # (replaces every host redoing the full sweep)
    idx_chunks, val_chunks = [], []

    def dispatch(sv):
        sel, valid = sv
        images = source.images[base_idx[sel]]
        # flip stays a HOST array: the step dispatches flip-free batches to
        # a specialized graph with a cheap host check (jit transfers it)
        return infer_step(variables, jnp.asarray(images), flip[sel])

    mine = (batches[b] for b in multihost.my_batches(len(batches)))
    for (sel, valid), d_probs in _pipeline2(mine, dispatch):
        vals = np.asarray(d_probs)[valid]
        out[sel[valid]] = vals
        idx_chunks.append(sel[valid])
        val_chunks.append(vals)
    multihost.merge_process_rows([out], idx_chunks, [val_chunks])
    return out


def iter_tiles_and_counts(
    source,
    tile_step,
    image_step,
    variables,
    image_batch: int = 64,
):
    """Per-batch fused drawing sweep: yields (rows, probs, counts) one batch
    behind the device, where rows are the batch's valid global row indices,
    probs [B, T] float32 tile P(positive), counts [B] int64 (diverged-
    regressor clamped, see _clean_counts).

    This generator owns the fused sweep's invariants for every consumer
    (inference_tiles_and_counts, the trainers' streamed draw_pseudo_masks):
    each uint8 image batch crosses host→device ONCE and serves both the
    tile sweep and the count head — on a tunneled chip the duplicate
    ~17 MB/batch upload was most of the drawing loop's non-sweep time
    (docs/PERF.md); the tile step receives a HOST flip array (its flip-free
    fast-path dispatch), the image step a device one; batches round-robin
    across processes (multihost.my_batches), so both steps must be
    PROCESS-LOCAL plain jits.
    """
    n = len(source)
    flip = getattr(source, "flip_code", np.zeros(n, dtype=np.int32))
    base_idx = getattr(source, "base_idx", np.arange(n))
    batches = list(BatchIterator(n, image_batch, shuffle=False))

    def dispatch(sv):
        sel, valid = sv
        dev_images = jnp.asarray(source.images[base_idx[sel]])
        probs = tile_step(variables, dev_images, flip[sel])
        _, regs = image_step(variables, dev_images, jnp.asarray(flip[sel]))
        return probs, regs

    mine = (batches[b] for b in multihost.my_batches(len(batches)))
    for (sel, valid), (d_probs, d_regs) in _pipeline2(mine, dispatch):
        yield (
            sel[valid],
            np.asarray(d_probs)[valid],
            _clean_counts(np.asarray(d_regs)[valid]),
        )


def inference_tiles_and_counts(
    source,
    tile_step,
    image_step,
    variables,
    tile_size: int,
    interval: int,
    image_batch: int = 64,
):
    """Fused stage-3 drawing sweep: dense tile probs + image-head counts in
    one pass over the data. Returns (probs [N, T] float32, counts [N] int64).

    Equivalent to ``inference_tiles(...)`` followed by
    ``inference_image(...)[1]`` (reference: train_seg.py:219-276 runs these
    as two dataloader passes) — see iter_tiles_and_counts for the fused
    upload/pipelining contract. Used by the multi-host drawing path, which
    must materialize full [N, T] probs to merge rows across processes.
    """
    h, w = source.image_hw
    n_t = tile_grid(h, w, tile_size, interval).shape[0]
    n = len(source)
    probs_out = np.zeros((n, n_t), dtype=np.float32)
    counts_out = np.zeros(n, dtype=np.int64)
    idx_chunks, val_chunks, cnt_chunks = [], [], []
    for rows, vals, cnt in iter_tiles_and_counts(
        source, tile_step, image_step, variables, image_batch=image_batch
    ):
        probs_out[rows] = vals
        counts_out[rows] = cnt
        idx_chunks.append(rows)
        val_chunks.append(vals)
        cnt_chunks.append(cnt)
    multihost.merge_process_rows(
        [probs_out, counts_out], idx_chunks, [val_chunks, cnt_chunks]
    )
    return probs_out, counts_out


def sample_topk(
    source: LystoDataSource,
    probs: np.ndarray,
    tile_size: int,
    interval: int,
    tiles_per_pos: int,
    topk_neg: int,
    pos_neg_ratio: Optional[float] = None,
    seed: int = 0,
) -> dict:
    """Adaptive top-k selection + pos/neg-ratio pruning -> stage-2 train data.

    Device: rank-mask top-k per image (ops/topk.py ≡ reference
    inference.py:31-43). Host: binarize tile labels by the parent image's
    count and prune the majority class to the requested ratio after a
    shuffle (reference: dataset/dataset.py:166-201).

    Returns {'img_idx', 'xs', 'ys', 'flip', 'label', 'n_pos', 'n_neg'}.
    """
    h, w = source.image_hw
    coords = tile_grid(h, w, tile_size, interval)
    labels = source.labels
    mask = np.asarray(
        adaptive_topk_mask(
            jnp.asarray(probs), jnp.asarray(labels), tiles_per_pos, topk_neg
        )
    )

    sample_idx, tile_idx = np.nonzero(mask)
    img_idx = source.base_idx[sample_idx].astype(np.int32)
    flip = source.flip_code[sample_idx].astype(np.int32)
    xs = coords[tile_idx, 0].astype(np.int32)
    ys = coords[tile_idx, 1].astype(np.int32)
    tlabel = (labels[sample_idx] > 0).astype(np.int32)

    order = np.random.default_rng(seed).permutation(len(tlabel))
    img_idx, flip, xs, ys, tlabel = (
        a[order] for a in (img_idx, flip, xs, ys, tlabel)
    )

    pos = int(tlabel.sum())
    neg = len(tlabel) - pos
    if pos_neg_ratio is not None:
        if pos > int(neg * pos_neg_ratio):
            excess, flag = pos - int(neg * pos_neg_ratio), 1
        elif neg > int(pos / pos_neg_ratio):
            excess, flag = neg - int(pos / pos_neg_ratio), 0
        else:
            excess, flag = 0, None
        if excess:
            drop = np.nonzero(tlabel == flag)[0][:excess]
            keep = np.ones(len(tlabel), dtype=bool)
            keep[drop] = False
            img_idx, flip, xs, ys, tlabel = (
                a[keep] for a in (img_idx, flip, xs, ys, tlabel)
            )
            pos = int(tlabel.sum())
            neg = len(tlabel) - pos

    return {
        "img_idx": img_idx,
        "xs": xs,
        "ys": ys,
        "flip": flip,
        "label": tlabel,
        "n_pos": pos,
        "n_neg": neg,
    }


def inference_seg(
    source,
    infer_step,
    variables,
    batch_size: int = 16,
) -> np.ndarray:
    """Soft positive-class masks [N, H, W] (reference: inference.py:140-153)."""
    n = len(source)
    h, w = source.image_hw
    flip = getattr(source, "flip_code", np.zeros(n, dtype=np.int32))
    base_idx = getattr(source, "base_idx", np.arange(n))
    out = np.zeros((n, h, w), dtype=np.float32)

    def dispatch(sv):
        sel, valid = sv
        images = source.images[base_idx[sel]]
        return infer_step(variables, jnp.asarray(images), jnp.asarray(flip[sel]))

    it = BatchIterator(n, batch_size, shuffle=False)
    for (sel, valid), d_masks in _pipeline2(it, dispatch):
        out[sel[valid]] = np.asarray(d_masks)[valid]
    return out
