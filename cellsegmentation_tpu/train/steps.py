"""Jitted train/eval steps for the three pipeline stages.

One factory per stage returns a donated, jit-compiled step over static
shapes. Batches carry validity masks (last-batch padding) so every epoch
reuses one compiled program. Data parallelism is by input sharding: batches
arrive sharded over the mesh 'data' axis (parallel/sharding.py) and XLA
psums the gradients.

Stage specs (reference: train/train.py):
- image (stage 1): loss = alpha*CE(cls) + beta*MSE(reg), alpha=beta=1
  (reference: train/train.py:80-83, train_image.py:284-285); single-head
  variants for --reg_only / ensemble (:109-169);
- tile (stage 2): CE over selected tiles with frozen encoder stats
  (freeze_bn=True, reference: train/train.py:33);
- segment (stage 3): CE computed for logging but loss = dice only
  (reference: train/train.py:188-195).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu.data.batches import normalize_images
from cellsegmentation_tpu.models.milnet import MILNet
from cellsegmentation_tpu.ops import losses
from cellsegmentation_tpu.ops.tiles import extract_tiles
from cellsegmentation_tpu.train.state import MILTrainState


def _masked_mean(values: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    valid = valid.astype(jnp.float32)
    return jnp.sum(values * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _dropout_rng(base_rng: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    return jax.random.fold_in(base_rng, step)


def _flip_tiles(tiles: jnp.ndarray, flip_codes: jnp.ndarray) -> jnp.ndarray:
    """Flip tile *content* per sample — the reference augments the sliced
    tile, not the parent image (reference: dataset/dataset.py:210-211)."""
    do_h = ((flip_codes == 1) | (flip_codes == 3))[:, None, None, None]
    do_v = ((flip_codes == 2) | (flip_codes == 3))[:, None, None, None]
    tiles = jnp.where(do_h, tiles[:, :, ::-1, :], tiles)
    return jnp.where(do_v, tiles[:, ::-1, :, :], tiles)


# --------------------------------------------------------------------------
# Stage 1 — image-wise counter
# --------------------------------------------------------------------------

def make_image_train_step(
    model: MILNet,
    alpha: float = 1.0,
    beta: float = 1.0,
    heads: str = "both",  # "both" | "cls" | "reg"
    reg_loss: str = "mse",  # "mse" | "weighted_mse"
):
    """Step over batches {images: u8 [B,H,W,3], flip, cls, reg, valid}.

    ``reg_loss="weighted_mse"`` applies the reference's WeightedMSELoss
    (ln-weight quirk included; reference: train/losses.py:17-29, kept as an
    option like the commented-out criterion at train_image.py:478).
    """

    def loss_fn(params, batch_stats, batch, rng):
        x = normalize_images(batch["images"], batch["flip"])
        (out_cls, out_reg), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            mode="image",
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        valid = batch["valid"]
        logp = jax.nn.log_softmax(out_cls.astype(jnp.float32), axis=-1)
        ce_each = -jnp.take_along_axis(
            logp, batch["cls"][:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        ce = _masked_mean(ce_each, valid)
        targets = batch["reg"].astype(jnp.float32)
        se_each = (out_reg[:, 0].astype(jnp.float32) - targets) ** 2
        if reg_loss == "weighted_mse":
            weights = jnp.where(
                targets >= 20, jnp.log(jnp.maximum(targets, 1e-12)), targets
            )
            se_each = weights * se_each
        se = _masked_mean(se_each, valid)
        if heads == "cls":
            loss = alpha * ce
        elif heads == "reg":
            loss = beta * se
        else:
            loss = alpha * ce + beta * se
        return loss, (mutated["batch_stats"], ce, se)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: MILTrainState, batch: dict, base_rng: jnp.ndarray):
        rng = _dropout_rng(base_rng, state.step)
        grads, (new_stats, ce, se) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"loss_cls": ce, "loss_reg": se, "loss": alpha * ce + beta * se}
        return new_state, metrics

    return step


@functools.lru_cache(maxsize=8)
def make_image_infer_step(model: MILNet):
    """(variables, images u8, flip) -> (cls_probs [B,7], counts [B] f32).

    Cached per model (flax Modules hash by config): callers like
    draw_pseudo_masks rebuild their steps every call, and a fresh jit
    closure re-traces the full image graph each time (~1-2 s of host time
    per call in the stage-3 sweep decomposition, docs/PERF.md)."""

    @jax.jit
    def infer(variables, images, flip):
        x = normalize_images(images, flip)
        out_cls, out_reg = model.apply(variables, x, mode="image", train=False)
        probs = jax.nn.softmax(out_cls.astype(jnp.float32), axis=-1)
        return probs, out_reg[:, 0].astype(jnp.float32)

    return infer


# --------------------------------------------------------------------------
# Stage 2 — MIL tile classifier
# --------------------------------------------------------------------------

def make_tile_infer_step(
    model: MILNet, tile_size: int, coords=None, variables=None,
    engine=None, calib_images=None,
):
    """Dense tile inference over whole images resident on device.

    (variables, images u8 [G,H,W,3], flip [G]) -> probs [G,T] = softmax
    P(positive) per tile (reference: inference.py:9-28). ``coords`` is the
    STATIC [T, 2] grid (a product grid hits the factored row-band gather in
    ops/tiles.py); tiles are extracted on device, flipped per the parent
    sample's augmentation code, and batched as one [G·T] forward so the MXU
    sees a single large conv batch.

    ``engine="q8"`` (requires ``variables`` + ``calib_images`` u8 for scale
    calibration) runs the trunk through the serving engine
    (ops/infer_engine.py: BN folded, bf16-out convs, calibrated int8
    activation sandwiches — measured +19% over the flax graph). Valid while
    the encoder stays frozen — i.e. the whole stage-2 cycle; only fc_tile
    is read per call. Falls back to the flax path for unfoldable encoders.
    ``engine="auto"`` picks the fastest validated chain for the platform:
    dense shared-stem int8-GEMM (q8dg) when the grid lives on the /4 stem
    lattice and the arch folds, else per-tile q8, else flax.

    For backward compatibility coords may be omitted, in which case the step
    accepts it as a (static, hashable-free) 4th array argument via the
    general gather path.
    """
    import numpy as np

    if coords is None:
        @jax.jit
        def infer_dyn(variables, images, flip, coords_arr):
            return _tile_infer_body(model, tile_size, variables, images, flip, coords_arr)

        infer_dyn.resolved_engine = "flax"
        return infer_dyn

    coords = np.asarray(coords)

    built, engine, resolved = _try_dense_engine(
        model, tile_size, coords, engine, variables, calib_images
    )
    if built is not None:
        dense_probs_fn, tree = built

        @jax.jit
        def infer_dense(head_params, tree, images, flip):
            return dense_probs_fn(head_params, tree, images, flip)

        @jax.jit
        def infer_dense_noflip(head_params, tree, images):
            return dense_probs_fn(head_params, tree, images, None)

        def infer_with_dense(variables_in, images, flip):
            head = variables_in["params"]["fc_tile"]
            # flip-free batches (val/test sweeps, pseudo-mask drawing,
            # bench) take the specialized graph: no whole-image
            # reverse, no double-read selects. Callers pass host flip
            # arrays so this check costs no device fetch.
            f = flip if isinstance(flip, np.ndarray) else np.asarray(flip)
            if not f.any():
                return infer_dense_noflip(head, tree, images)
            return infer_dense(head, tree, images, flip)

        infer_with_dense.resolved_engine = resolved
        return infer_with_dense

    if engine in ("q8", "q8g", "auto") and variables is not None and calib_images is not None:
        from cellsegmentation_tpu.ops.infer_engine import (
            calib_tiles_from_images,
            make_fast_tile_logits,
        )

        calib = calib_tiles_from_images(calib_images, coords, tile_size)
        built = make_fast_tile_logits(
            model, variables, calib_tiles=calib,
            backend="gemm" if engine == "q8g" else "conv",
        )
        if built is not None:
            fast_logits, trunk_tree = built

            @jax.jit
            def infer_q8_step(head_params, trunk_tree, images, flip):
                g = images.shape[0]
                tiles = extract_tiles(images, coords, tile_size)
                t = tiles.shape[1]
                flat = tiles.reshape(g * t, tile_size, tile_size, 3)
                x = normalize_images(
                    flat, jnp.repeat(flip, t), dtype=jnp.bfloat16
                )
                logits = fast_logits(head_params, trunk_tree, x)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
                return probs.reshape(g, t)

            def infer_with_engine(variables_in, images, flip):
                return infer_q8_step(
                    variables_in["params"]["fc_tile"], trunk_tree, images, flip
                )

            infer_with_engine.resolved_engine = (
                "q8g" if engine == "q8g" else "q8"
            )
            return infer_with_engine

    @jax.jit
    def infer(variables, images, flip):
        return _tile_infer_body(model, tile_size, variables, images, flip, coords)

    infer.resolved_engine = "flax"
    return infer


def _resolve_dense_engine(engine):
    """Which dense shared-stem engine (if any) an ``engine`` request maps to.

    ``"auto"`` promotes to the dense int8-GEMM engine (q8dg — the fastest
    validated serving path, docs/PERF.md) on real accelerators; on the CPU
    backend Pallas only runs in interpret mode (a per-grid-cell Python
    loop, not a serving target), so auto resolves to the per-tile q8 path
    there. Explicit ``"q8d"``/``"q8dg"`` requests are always honored.
    """
    if engine in ("q8d", "q8dg"):
        return engine
    if engine == "auto" and jax.default_backend() != "cpu":
        return "q8dg"
    return None


def _try_dense_engine(model, tile_size, coords, engine, variables,
                      calib_images):
    """Shared dense-engine resolution for both step factories.

    Returns ``(built, engine, resolved)``: ``built`` is the
    (dense_probs_fn, tree) pair when the request resolves to a dense
    engine AND the grid/arch supports it, with ``resolved`` naming the
    concrete dense engine ("q8d"/"q8dg"); otherwise (None, fallback
    engine, None) with ``engine`` remapped to the per-tile fallback chain.
    """
    dense_try = _resolve_dense_engine(engine)
    if dense_try and variables is not None and calib_images is not None:
        built = _build_dense_engine(
            model, variables, tile_size, coords, calib_images,
            backend="gemm" if dense_try == "q8dg" else "conv",
        )
        if built is not None:
            if engine == "auto":
                # Auto promotion changes stem/layer1 numerics vs the
                # per-tile zero-padded forward (real neighbor pixels at
                # tile borders — a validated approximation, gated by the
                # selection-agreement tests). Say so once per build so
                # runs are attributable.
                print(
                    f"[engine] auto -> {dense_try} (dense shared-stem "
                    "sweep; validated approximation of the per-tile "
                    "forward — pass --infer_engine q8/flax for exact "
                    "per-tile numerics)"
                )
            return built, engine, dense_try
        # per-tile fallback when the grid/arch is dense-ineligible
        return None, {"q8d": "q8", "q8dg": "q8g", "auto": "q8"}[engine], None
    return None, engine, None


def _build_dense_engine(model, variables, tile_size, coords, calib_images,
                        backend: str):
    """Shared-stem dense sweep builder; None when grid/arch unsupported.

    Image size is taken from the calibration images (full frames); the
    coordinate table must be the canonical product grid of ``tile_grid``.
    """
    import numpy as np

    from cellsegmentation_tpu.ops.infer_engine import (
        calib_tiles_from_images,
        make_dense_tile_probs,
    )
    from cellsegmentation_tpu.ops.tiles import tile_grid

    calib_images = np.asarray(calib_images)
    hw = calib_images.shape[1]
    coords = np.asarray(coords)
    xs = np.unique(coords[:, 0])
    if len(xs) < 2:
        return None
    interval = int(xs[1] - xs[0])
    if not np.array_equal(coords, tile_grid(hw, hw, tile_size, interval)):
        return None
    calib = calib_tiles_from_images(calib_images, coords, tile_size)
    return make_dense_tile_probs(
        model, variables, tile_size, interval, hw, calib, backend=backend
    )


def make_stack_tile_infer_step(
    model: MILNet, tile_size: int, coords, mesh=None,
    variables=None, engine=None, calib_images=None,
):
    """Dense tile inference gathering images from the device-resident stack.

    (variables, images_stack u8 [N,H,W,3] replicated, idx i32 [G] dp-sharded,
    flip [G]) -> probs [G,T]. The gather + forward run inside ONE jit so the
    batch is dp-sharded over the mesh's data axis (an eager stack gather
    would propagate the stack's replicated sharding and every chip would
    redo the full sweep). The stack itself stays replicated by design: the
    stage-2 hot loops gather random tiles across images, and replication
    keeps that gather collective-free (LYSTO's 20k×299² u8 stack ≈ 5.4 GB,
    comfortably resident per v5e chip).

    ``engine="q8"``/``"auto"`` (+ variables + calib_images): the forward
    runs through the serving engine — valid for the whole stage-2 cycle
    since the encoder is frozen; only fc_tile is re-read per call.
    """
    import numpy as np

    coords = np.asarray(coords)
    dp_spec = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cellsegmentation_tpu.parallel.mesh import DATA_AXIS

        dp_spec = NamedSharding(mesh, P(DATA_AXIS, None, None, None))

    built, engine, resolved = _try_dense_engine(
        model, tile_size, coords, engine, variables, calib_images
    )
    if built is not None:
        dense_probs_fn, tree = built

        if mesh is not None:
            # The dense graph ends in Pallas GEMM custom calls, which
            # the SPMD partitioner cannot split on its own (a bare
            # sharding constraint would make it replicate the full
            # sweep per chip). Every row of the sweep is per-image
            # independent, so shard_map over the data axis is exact:
            # each chip runs the whole dense graph on its local image
            # shard (per-shard TILE_ALIGN padding included).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from cellsegmentation_tpu.parallel.mesh import DATA_AXIS

            sharded_probs = shard_map(
                dense_probs_fn, mesh=mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            )

            @jax.jit
            def infer_dense_stack(head_params, tree, images_stack, idx,
                                  flip):
                imgs = jnp.take(images_stack, idx, axis=0)
                imgs = jax.lax.with_sharding_constraint(imgs, dp_spec)
                return sharded_probs(head_params, tree, imgs, flip)
        else:
            @jax.jit
            def infer_dense_stack(head_params, tree, images_stack, idx,
                                  flip):
                imgs = jnp.take(images_stack, idx, axis=0)
                return dense_probs_fn(head_params, tree, imgs, flip)

        def infer_with_dense(variables_in, images_stack, idx, flip):
            return infer_dense_stack(
                variables_in["params"]["fc_tile"], tree,
                images_stack, idx, flip,
            )

        infer_with_dense.resolved_engine = resolved
        return infer_with_dense

    fast = None
    if engine in ("q8", "q8g", "auto") and variables is not None and calib_images is not None:
        from cellsegmentation_tpu.ops.infer_engine import (
            calib_tiles_from_images,
            make_fast_tile_logits,
        )

        calib = calib_tiles_from_images(calib_images, coords, tile_size)
        fast = make_fast_tile_logits(
            model, variables, calib_tiles=calib,
            backend="gemm" if engine == "q8g" else "conv",
        )

    if fast is not None:
        fast_logits, trunk_tree = fast

        def q8_probs_body(head_params, tree, imgs, flip):
            g = imgs.shape[0]
            tiles = extract_tiles(imgs, coords, tile_size)
            t = tiles.shape[1]
            flat = tiles.reshape(g * t, tile_size, tile_size, 3)
            x = normalize_images(flat, jnp.repeat(flip, t), dtype=jnp.bfloat16)
            logits = fast_logits(head_params, tree, x)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
            return probs.reshape(g, t)

        if mesh is not None:
            # shard_map, not a bare sharding constraint: the q8g per-tile
            # path ends in Pallas GEMM custom calls the SPMD partitioner
            # can't split (it would replicate the full sweep per chip).
            # Every row is per-image independent, so mapping the data axis
            # is exact — this is the multi-chip path for the stage-3 16/5
            # pseudo-mask sweep (reference: the dead DistributedSampler
            # branch at train_seg.py:169-180).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from cellsegmentation_tpu.parallel.mesh import DATA_AXIS

            sharded_q8 = shard_map(
                q8_probs_body, mesh=mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            )

            @jax.jit
            def infer_q8(head_params, trunk_tree, images_stack, idx, flip):
                imgs = jnp.take(images_stack, idx, axis=0)
                imgs = jax.lax.with_sharding_constraint(imgs, dp_spec)
                return sharded_q8(head_params, trunk_tree, imgs, flip)
        else:
            @jax.jit
            def infer_q8(head_params, trunk_tree, images_stack, idx, flip):
                imgs = jnp.take(images_stack, idx, axis=0)
                return q8_probs_body(head_params, trunk_tree, imgs, flip)

        def infer_with_engine(variables_in, images_stack, idx, flip):
            return infer_q8(
                variables_in["params"]["fc_tile"], trunk_tree,
                images_stack, idx, flip,
            )

        infer_with_engine.resolved_engine = (
            "q8g" if engine == "q8g" else "q8"
        )
        return infer_with_engine

    @jax.jit
    def infer(variables, images_stack, idx, flip):
        imgs = jnp.take(images_stack, idx, axis=0)
        if dp_spec is not None:
            imgs = jax.lax.with_sharding_constraint(imgs, dp_spec)
        return _tile_infer_body(model, tile_size, variables, imgs, flip, coords)

    infer.resolved_engine = "flax"
    return infer


def _tile_infer_body(model, tile_size, variables, images, flip, coords):
    g = images.shape[0]
    tiles = extract_tiles(images, coords, tile_size)  # [G,T,ts,ts,3] u8
    t = tiles.shape[1]
    flat = tiles.reshape(g * t, tile_size, tile_size, 3)
    flip_per_tile = jnp.repeat(flip, t)
    # bf16 normalize: flips on u8 bytes, affine into the compute dtype — no
    # f32 copy of the 40k-tile tensor exists on the hot path
    x = normalize_images(flat, flip_per_tile, dtype=model.policy.compute_dtype)
    logits = model.apply(variables, x, mode="tile", train=False)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]
    return probs.reshape(g, t)


def make_tile_train_step(model: MILNet, tile_size: int, gamma: float = 1.0):
    """CE training over selected tiles gathered from device-resident images.

    batch: {img_idx [B], xs [B], ys [B], flip [B], label [B], valid [B]};
    images_dev: the full uint8 image stack (sharded or replicated).
    Encoder batch stats are frozen (the freeze_bn trick) and only fc_tile
    gets optimizer updates (reference: train/train.py:12-48).
    """

    def gather_tiles(images_dev, img_idx, xs, ys):
        def one(i, x, y):
            return jax.lax.dynamic_slice(
                images_dev, (i, x, y, 0), (1, tile_size, tile_size, 3)
            )[0]

        return jax.vmap(one)(img_idx, xs, ys)

    def loss_fn(params, batch_stats, images_dev, batch):
        tiles = gather_tiles(images_dev, batch["img_idx"], batch["xs"], batch["ys"])
        tiles = _flip_tiles(tiles, batch["flip"])
        x = normalize_images(tiles, jnp.zeros_like(batch["flip"]))
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            mode="tile",
            train=True,
            freeze_encoder_stats=True,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce_each = -jnp.take_along_axis(
            logp, batch["label"][:, None].astype(jnp.int32), axis=-1
        )[:, 0]
        ce = _masked_mean(ce_each, batch["valid"])
        return gamma * ce, ce

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: MILTrainState, images_dev, batch: dict):
        grads, ce = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images_dev, batch
        )
        new_state = state.apply_gradients(grads, state.batch_stats)
        return new_state, {"loss": ce}

    return step


def make_alternative_train_step(model: MILNet, tile_size: int, alpha=1.0, beta=1.0):
    """Per-batch alternation: a tile CE update then an image CE+MSE update
    (reference: train/train.py:210-300 ``train_alternative`` — present in the
    reference but unused by its CLIs; provided for capability parity).

    Expects two pre-built MILTrainState objects — one masked for 'tile', one
    for 'image' — sharing the same param tree; returns both updated. batch:
    {images, flip, cls, reg, valid} ∪ {img_idx, xs, ys, tflip, tlabel, tvalid}.
    """

    tile_step = make_tile_train_step(model, tile_size)
    image_step = make_image_train_step(model, alpha=alpha, beta=beta)

    def step(tile_state, image_state, images_dev, batch, rng):
        tile_batch = {
            "img_idx": batch["img_idx"],
            "xs": batch["xs"],
            "ys": batch["ys"],
            "flip": batch["tflip"],
            "label": batch["tlabel"],
            "valid": batch["tvalid"],
        }
        tile_state, tile_metrics = tile_step(tile_state, images_dev, tile_batch)
        # the image pass sees the tile update; params AND batch_stats must be
        # re-threaded because the steps donate their state buffers
        image_state = image_state.replace(
            params=tile_state.params, batch_stats=tile_state.batch_stats
        )
        image_batch = {
            k: batch[k] for k in ("images", "flip", "cls", "reg", "valid")
        }
        image_state, image_metrics = image_step(image_state, image_batch, rng)
        tile_state = tile_state.replace(
            params=image_state.params, batch_stats=image_state.batch_stats
        )
        return tile_state, image_state, {**tile_metrics, **image_metrics}

    return step


# --------------------------------------------------------------------------
# Stage 3 — segmentation decoder
# --------------------------------------------------------------------------

def make_seg_train_step(model: MILNet):
    """batch: {images u8 [B,H,W,3], flip, mask [B,H,W] (0/1), valid}.

    Loss is dice on softmax channel 1; CE is returned for logging parity
    (reference: train/train.py:188-195). Encoder params frozen but its batch
    stats update (reference trains in module.train() mode).
    """

    def loss_fn(params, batch_stats, batch, rng):
        x = normalize_images(batch["images"], batch["flip"])
        seg_logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            mode="segment",
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        probs_pos = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)[..., 1]
        mask = batch["mask"].astype(jnp.float32)
        valid = batch["valid"].astype(jnp.float32)
        dice_each = 1 - losses.dice_coef(probs_pos, mask)  # [B]
        dice = jnp.sum(dice_each * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        # CE for logging (per-pixel, masked over valid samples)
        logp = jax.nn.log_softmax(seg_logits.astype(jnp.float32), axis=-1)
        ce_map = -jnp.take_along_axis(
            logp, batch["mask"][..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        ce_each = jnp.mean(ce_map, axis=(1, 2))
        ce = jnp.sum(ce_each * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return dice, (mutated["batch_stats"], ce, dice)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: MILTrainState, batch: dict, base_rng: jnp.ndarray):
        rng = _dropout_rng(base_rng, state.step)
        grads, (new_stats, ce, dice) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, {"loss_ce": ce, "loss_dice": dice, "loss": dice}

    return step


@functools.lru_cache(maxsize=8)
def make_seg_infer_step(model: MILNet):
    """(variables, images u8, flip) -> P(positive) mask [B,H,W]
    (reference: inference.py:140-153, test mode takes softmax channel 1).
    Cached per model — see make_image_infer_step."""

    @jax.jit
    def infer(variables, images, flip):
        x = normalize_images(images, flip)
        seg_logits = model.apply(variables, x, mode="segment", train=False)
        return jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)[..., 1]

    return infer
