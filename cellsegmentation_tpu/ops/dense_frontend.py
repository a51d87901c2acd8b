"""Shared dense stem+layer1 frontend for the stage-2 tile sweep.

The 32/20 sliding grid covers 225·32² = 230k px of each 89.4k-px image —
2.58× redundant pixel compute when every tile runs the stem independently
(reference formulation: inference.py:9-28 forwards tiles as independent
crops). Because the stem's total stride (conv1 s2 + maxpool s2 = 4)
divides the 20-px interval, the stem and layer1 can run ONCE per image
densely, with each tile's 8×8 layer1-output patch *sliced* from the
dense /4-resolution feature map.

Geometry (hw=299, ts=32, interval=20):
- interior tiles (14×14 per axis) sit at coords ≡ 0 (mod 4): their patches
  are STATIC slices of a dense stem over the image cropped to 292²
  (the interior grid's exact span, interval·(n_reg−1)+ts);
- the border-completion row/col (coord 267 ≡ 3 mod 4) comes from thin
  STRIPS (rows 263..298) whose stem phase matches the border tile, plus a
  36×36 corner patch — ~26% of one dense stem instead of a second full
  phase;
- per-tile flip augmentation (reference: dataset/dataset.py:210-211 flips
  the sliced tile) is handled by flipping the whole image (cheap reversal
  selects on raw bytes) and cropping at ``crop0 = bx − interval·(n_reg−1)``
  instead of 0, which lands the mirrored interior coords on the SAME
  static /4 feature starts as the unflipped grid, in reversed tile order.
  Every data-dependent choice is therefore a 2-way ``where`` of two static
  slices — the hot path contains NO gathers (per-sample gathers/dynamic
  slices on [G,299,299,3] lower to serial loops on TPU; the gather-based
  first cut of this frontend measured 26 ms/step slower than this one).
  The reversed tile order is undone on the tiny [G, T] prob matrix
  (``unpermute_probs``), not on the 700 MB patch tensor.

Numerics: dense features see real neighbor pixels where the per-tile
forward sees zero padding (tile borders, stem+layer1 receptive fields
only; layers 2-4 pad identically either way). This is an *approximation
of the reference formulation* gated the same way as the q8 engine: by
tile-selection agreement against the flax path (tests/test_dense_frontend.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DenseGridMeta:
    hw: int
    tile_size: int
    interval: int
    n_reg: int  # interior tiles per axis
    n_all: int  # tiles per axis incl. the border-completion one
    bx: int  # border tile coordinate (hw - tile_size)
    crop0: int  # dense-stem crop start for flipped axes (0 unflipped)
    cropw: int  # dense-stem crop size: interval*(n_reg-1) + tile_size


def dense_grid_meta(hw: int, tile_size: int, interval: int):
    """None when the dense frontend does not apply (no 4-aligned grid)."""
    if interval % 4 or tile_size % 4:
        return None
    starts = list(range(0, hw - tile_size + 1, interval))
    bx = hw - tile_size
    if starts[-1] + tile_size == hw:
        return None  # no border-completion tile; not the LYSTO geometry
    if bx - 4 < starts[-1]:
        return None
    return DenseGridMeta(
        hw=hw, tile_size=tile_size, interval=interval,
        n_reg=len(starts), n_all=len(starts) + 1,
        bx=bx, crop0=bx - interval * (len(starts) - 1),
        cropw=interval * (len(starts) - 1) + tile_size,
    )


def apply_flips(images_u8: jnp.ndarray, flip_codes: jnp.ndarray) -> jnp.ndarray:
    """Whole-image flip by code (0 none / 1 h / 2 v / 3 both) on raw bytes."""
    do_h = ((flip_codes == 1) | (flip_codes == 3))[:, None, None, None]
    do_v = ((flip_codes == 2) | (flip_codes == 3))[:, None, None, None]
    x = jnp.where(do_h, images_u8[:, :, ::-1, :], images_u8)
    return jnp.where(do_v, x[:, ::-1, :, :], x)


def _sel(flag, a, b):
    """Per-sample 2-way select of equal-shape static slices: [G,...].

    ``flag=None`` means "no flipped samples in this batch": the unflipped
    branch is returned as-is and the dead flipped-branch slice is DCE'd —
    the all-zero-flip graph (val/test sweeps, pseudo-mask drawing, bench)
    skips every select's double read and the whole-image reverse.
    """
    if flag is None:
        return b
    return jnp.where(flag[:, None, None, None], a, b)


def frontend_patches(meta: DenseGridMeta, stem_fn, images_u8, flip_codes):
    """uint8 images + per-sample flip codes -> layer1-output patches
    [G*n_all², span, span, C] in CANVAS order (ascending feature starts,
    border band last per axis). For flipped axes canvas order is the
    REVERSED interior tile order — map probs back with ``unpermute_probs``.

    ``stem_fn(images_u8_cropped)`` must normalize + run stem/maxpool(/
    layer1) + quantize, returning the /4-resolution feature map. It is
    called on four static shapes: the base crop, two border strips, and
    the corner.
    """
    g = images_u8.shape[0]
    span = meta.tile_size // 4
    step = meta.interval // 4
    sw = meta.tile_size + 4  # strip width: border tile + 4-px halo
    if flip_codes is None:  # statically flip-free batch
        fx = fy = None
        xr = images_u8
    else:
        fx = (flip_codes == 2) | (flip_codes == 3)  # row-axis flip
        fy = (flip_codes == 1) | (flip_codes == 3)  # col-axis flip
        xr = apply_flips(images_u8, flip_codes)

    # crops: flipped axes start at crop0 so mirrored interior coords land
    # on the same static /4 starts; strips cover the border tile + halo
    # (at the image edge for flipped axes — the mirrored border sits at 0)
    def rows_base(x):
        return _sel(fx, x[:, meta.crop0 : meta.crop0 + meta.cropw],
                    x[:, : meta.cropw])

    def cols_base(x):
        return _sel(fy, x[:, :, meta.crop0 : meta.crop0 + meta.cropw],
                    x[:, :, : meta.cropw])

    def rows_strip(x):
        return _sel(fx, x[:, :sw], x[:, meta.bx - 4 :])

    def cols_strip(x):
        return _sel(fy, x[:, :, :sw], x[:, :, meta.bx - 4 :])

    f_base = stem_fn(cols_base(rows_base(xr)))  # [G, bf, bf, C]
    f_xs = stem_fn(cols_base(rows_strip(xr)))  # [G, sf, bf, C]
    f_ys = stem_fn(cols_strip(rows_base(xr)))  # [G, bf, sf, C]
    f_cn = stem_fn(cols_strip(rows_strip(xr)))  # [G, sf, sf, C]

    # border tile's strip-local feature start: 1 at the 4-px halo
    # (unflipped), 0 at the image edge (flipped)
    def band_rows(fs):
        return _sel(fx, fs[:, :span], fs[:, 1 : span + 1])

    def band_cols(fs):
        return _sel(fy, fs[:, :, :span], fs[:, :, 1 : span + 1])

    bx_band = band_rows(f_xs)  # [G, span, bf, C]
    ys_cols = band_cols(f_ys)  # [G, bf, span, C]
    cn_band = band_cols(band_rows(f_cn))  # [G, span, span, C]

    starts = [i * step for i in range(meta.n_reg)]
    # row pass: [G, n_all, span, ·, C] — static slices stacked in canvas
    # order, the border band appended last
    rb = jnp.concatenate(
        [f_base[:, None, s : s + span] for s in starts]
        + [bx_band[:, None]], axis=1
    )
    rs = jnp.concatenate(
        [ys_cols[:, None, s : s + span] for s in starts]
        + [cn_band[:, None]], axis=1
    )  # [G, n_all, span, span, C]
    # col pass -> [G, n_all, n_all, span, span, C]: the layout directly
    # reshapes to the [G·T, span, span, C] conv input, no transpose
    allp = jnp.concatenate(
        [rb[:, :, None, :, s : s + span] for s in starts]
        + [rs[:, :, None]], axis=2
    )
    c = allp.shape[-1]
    return allp.reshape(g * meta.n_all * meta.n_all, span, span, c)


def unpermute_probs(meta: DenseGridMeta, probs, flip_codes):
    """Canvas-order [G, n_all²] tile probs -> reference tile order.

    A flipped axis emits interior bands in reversed tile order (tile i
    lives at band n_reg-1-i; the border band is always last). Pure
    relayout of the tiny prob matrix — the 700 MB patch tensor upstream
    never needs reordering.
    """
    if flip_codes is None:
        return probs  # canvas order == tile order without flips
    g = probs.shape[0]
    n, nr = meta.n_all, meta.n_reg
    fx = (flip_codes == 2) | (flip_codes == 3)
    fy = (flip_codes == 1) | (flip_codes == 3)
    p = probs.reshape(g, n, n)
    rev = jnp.concatenate([p[:, nr - 1 :: -1], p[:, nr:]], axis=1)
    p = jnp.where(fx[:, None, None], rev, p)
    rev = jnp.concatenate([p[:, :, nr - 1 :: -1], p[:, :, nr:]], axis=2)
    p = jnp.where(fy[:, None, None], rev, p)
    return p.reshape(g, n * n)
