"""Host-side epoch orchestration for the three training stages.

Structure follows the reference call stacks (SURVEY §3): jitted steps do the
math, the host loop owns data-dependent control flow (epoch-level
re-sampling, validation cadence, checkpointing) so nothing recompiles.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu import evaluate as eval_mod
from cellsegmentation_tpu import infer
from cellsegmentation_tpu.data.batches import BatchIterator
from cellsegmentation_tpu.data.lysto import LystoDataSource
from cellsegmentation_tpu.models.milnet import MILNet
from cellsegmentation_tpu.ops import infer_engine as infer_engine_mod
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.parallel import multihost
from cellsegmentation_tpu.parallel.sharding import shard_batch
from cellsegmentation_tpu.train import checkpoint as ckpt_mod
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.schedules import make_schedule
from cellsegmentation_tpu.train.state import MILTrainState, create_train_state
from cellsegmentation_tpu.utils.logging import RunLogger
from cellsegmentation_tpu.utils.profiling import trace


@dataclasses.dataclass
class Stage1Result:
    state: MILTrainState
    last_metrics: Optional[tuple] = None  # (mAP, mse, qwk)


@dataclasses.dataclass
class Stage2Result:
    state: MILTrainState
    last_metrics: Optional[tuple] = None  # (err, fpr, fnr)
    # per-epoch sampled tile sets ({'img_idx','xs','ys','label'}), recorded
    # when train_stage2(record_selection=True) — the engine outcome A/B
    # (docs/VALIDATION.md) diffs these between serving engines
    selections: Optional[list] = None


@dataclasses.dataclass
class Stage3Result:
    state: MILTrainState
    last_loss: Optional[float] = None


def _device_batch(batch: dict, mesh=None) -> dict:
    if mesh is not None:
        return shard_batch(mesh, batch)
    return jax.tree_util.tree_map(jnp.asarray, batch)


class _MetricsPipe:
    """Per-epoch metric accumulator that defers each step's device→host
    scalar fetch by one step (the same 2-deep software pipeline as the
    inference loops in infer/__init__.py): batch i+1's upload + dispatch
    are in flight before batch i's metrics are fetched, so the fetch —
    which blocks until step i finishes — never leaves the device idle.
    Without it every `float(metrics[...])` serializes upload → compute →
    fetch per step (a real cost on a tunneled chip; on production TPU it
    simply keeps the device queue non-empty)."""

    def __init__(self):
        self.sums: dict = {}
        self.n = 0
        self._pending = None

    def push(self, metrics: dict) -> None:
        self._drain()
        self._pending = metrics
        self.n += 1

    def _drain(self) -> None:
        if self._pending is not None:
            for k, v in self._pending.items():
                self.sums[k] = self.sums.get(k, 0.0) + float(v)
            self._pending = None

    def means(self) -> dict:
        self._drain()
        return {k: v / max(self.n, 1) for k, v in self.sums.items()}


def _mesh_batch_size(batch_size: int, mesh) -> int:
    """Round a batch size up to a multiple of the mesh's data-axis size so
    dp-sharded dim 0 always divides evenly (padding masks absorb the slack)."""
    if mesh is None:
        return batch_size
    from cellsegmentation_tpu.parallel.mesh import DATA_AXIS

    m = int(mesh.shape[DATA_AXIS])
    return max(m, ((batch_size + m - 1) // m) * m)


def _host_iter(
    n: int, global_batch: int, mesh, *, shuffle: bool = True, seed: int = 0
) -> BatchIterator:
    """Process-sharded epoch iterator over GLOBAL batch sizes.

    Every process draws the same permutation (same seed) and walks its own
    interleaved shard; shard_batch then assembles the global dp-sharded
    batch from each host's local rows. Replaces the reference's
    DistributedSampler (reference: train_image.py:432-439).
    """
    pi, pc = jax.process_index(), jax.process_count()
    gb = _mesh_batch_size(global_batch, mesh)
    if gb % pc:
        gb = -(-gb // pc) * pc
    return BatchIterator(
        n, gb // pc, shuffle=shuffle, seed=seed,
        process_index=pi, process_count=pc,
    )


def train_stage1(
    model: MILNet,
    variables: dict,
    train_source: LystoDataSource,
    val_source: Optional[LystoDataSource],
    *,
    epochs: int = 50,
    batch_size: int = 48,
    lr: float = 5e-4,
    weight_decay: float = 1e-4,
    scheduler: Optional[str] = None,
    test_every: int = 1,
    heads: str = "both",
    reg_loss: str = "mse",
    hard_threshold: Optional[float] = None,
    encoder_name: str = "resnet50",
    output_dir: Optional[str] = None,
    logger: Optional[RunLogger] = None,
    mesh=None,
    seed: int = 42,
    last_epoch: int = 0,
    resume_opt_state=None,
    save_every_epoch: bool = True,
) -> Stage1Result:
    """PT.1 image-assessment training (reference: train_image.py:244-366).

    Loss = CE(cls) + MSE(reg) with alpha=beta=1; validation computes
    (mAP placeholder, MSE, QWK); optional hard-example resampling replaces
    random training samples with mispredicted ones from a scoring set. NB:
    the reference re-adds the *first* N scoring images instead of the hard
    ones (an indexing slip at train_image.py:352-353); we add the actual
    hard examples.
    """
    logger = logger or RunLogger(output_dir or "./output")
    batch_size = _mesh_batch_size(batch_size, mesh)
    it = _host_iter(len(train_source), batch_size, mesh, shuffle=True, seed=seed)
    steps_per_epoch = len(it)
    schedule = make_schedule(scheduler, lr, epochs, steps_per_epoch)
    state = create_train_state(
        variables["params"],
        variables["batch_stats"],
        {"both": "image", "cls": "image_cls", "reg": "image_reg"}[heads],
        schedule,
        use_sgd=scheduler is not None,  # reference: SGD iff scheduler given
        weight_decay=weight_decay,
    )
    if last_epoch:
        # schedules are pure functions of the step counter, so resuming is
        # just fast-forwarding it (reference restores scheduler.last_epoch,
        # train_image.py:514-517); the shuffle stream fast-forwards too so
        # resumed epochs see the same permutations a straight run would
        state = state.replace(
            step=jnp.asarray(last_epoch * steps_per_epoch, jnp.int32)
        )
        it.fast_forward(last_epoch)
    if resume_opt_state is not None:
        # serialized optimizer dict from a checkpoint — restores Adam
        # moments / SGD momentum, not just the step counter (reference:
        # train_image.py:463-474)
        state = state.replace(
            opt_state=ckpt_mod.restore_opt_state(state.opt_state, resume_opt_state)
        )
    step_fn = steps_mod.make_image_train_step(model, heads=heads, reg_loss=reg_loss)
    infer_fn = steps_mod.make_image_infer_step(model)
    base_rng = jax.random.PRNGKey(seed)

    last_metrics = None
    cls_labels = train_source.cls_labels
    for epoch in range(1 + last_epoch, epochs + 1):
        try:
            pipe = _MetricsPipe()
            cls_labels = train_source.cls_labels  # refresh after resampling
            # CST_PROFILE=1 captures a jax.profiler trace of the first epoch
            prof = (
                trace(os.path.join(output_dir or ".", "profile"))
                if epoch == 1 + last_epoch
                else contextlib.nullcontext()
            )
            with prof:
                for sel, valid in it:
                    batch = _device_batch(
                        {
                            "images": train_source.gather_images(sel),
                            "flip": train_source.flip_code[sel],
                            "cls": cls_labels[sel],
                            "reg": train_source.labels[sel].astype(np.float32),
                            "valid": valid,
                        },
                        mesh,
                    )
                    state, metrics = step_fn(state, batch, base_rng)
                    pipe.push(metrics)
            means = pipe.means()
            logger.info(
                f"[stage1 epoch {epoch}/{epochs}] "
                + " | ".join(f"{k}: {v:.4f}" for k, v in means.items())
            )
            logger.csv_row(
                "image-training",
                ["epoch", "image_cls_loss", "image_reg_loss", "image_loss"],
                [epoch, means.get("loss_cls", 0), means.get("loss_reg", 0), means.get("loss", 0)],
            )
            logger.scalars({f"image/{k}": v for k, v in means.items()}, epoch)

            if (val_source is not None and len(val_source) > 0
                    and epoch % test_every == 0):
                categories, counts = infer.inference_image(
                    val_source, infer_fn, state.variables, batch_size=batch_size
                )
                m = eval_mod.evaluate_image(val_source.labels, categories, counts)
                last_metrics = m
                logger.info(
                    f"  val mAP: {m[0]} | MSE: {m[1]:.3f} | QWK: {m[2]:.4f}"
                )
                logger.csv_row(
                    "image-validation",
                    ["epoch", "image_map", "mse", "qwk"],
                    [epoch, *m],
                )
                logger.scalars({"val/mse": m[1], "val/qwk": m[2]}, epoch)

            if hard_threshold is not None:
                # Score the training pool itself and duplicate mispredicted
                # samples. Deviations from the reference, both deliberate:
                # it scores a kfold=None set that leaks validation images
                # into training (train_image.py:274-276), and its add loop
                # re-adds the first N images instead of the hard ones (:352).
                _, counts = infer.inference_image(
                    train_source, infer_fn, state.variables, batch_size=batch_size
                )
                hard = np.nonzero(
                    np.abs(counts - train_source.labels) >= hard_threshold
                )[0]
                if len(hard):
                    rows = train_source.snapshot_rows(hard)
                    train_source.random_delete(len(hard))
                    train_source.append_rows(*rows)
                    it = _host_iter(
                        len(train_source), batch_size, mesh,
                        shuffle=True, seed=seed + epoch,
                    )
                    logger.info(f"  resampled {len(hard)} hard examples")

            if output_dir and save_every_epoch:
                ckpt_mod.save_checkpoint(
                    output_dir,
                    "image",
                    epoch,
                    encoder_name,
                    state.params,
                    state.batch_stats,
                    opt_state=state.opt_state,
                    step=int(state.step),
                )
        except KeyboardInterrupt:
            if output_dir:
                ckpt_mod.save_checkpoint(
                    output_dir, "image", epoch, encoder_name,
                    state.params, state.batch_stats,
                    opt_state=state.opt_state, step=int(state.step),
                )
            logger.info(f"interrupted at epoch {epoch}; checkpoint saved")
            raise

    return Stage1Result(state=state, last_metrics=last_metrics)


def train_stage2(
    model: MILNet,
    variables: dict,
    train_source: LystoDataSource,
    val_source: Optional[LystoDataSource],
    *,
    epochs: int = 30,
    tile_batch_size: int = 40960,
    image_batch: int = 128,
    tile_size: int = 32,
    interval: int = 20,
    tiles_per_pos: int = 1,
    topk_neg: int = 30,
    pos_neg_ratio: Optional[float] = 0.5,
    threshold: float = 0.95,
    lr: float = 5e-5,
    weight_decay: float = 1e-4,
    scheduler: Optional[str] = None,
    test_every: int = 1,
    encoder_name: str = "resnet50",
    output_dir: Optional[str] = None,
    logger: Optional[RunLogger] = None,
    mesh=None,
    seed: int = 42,
    last_epoch: int = 0,
    resume_opt_state=None,
    infer_engine: str = "auto",
    record_selection: bool = False,
) -> Stage2Result:
    """PT.2 MIL tile-classifier training — the adaptive top-k cycle
    (reference: train_tile.py:71-156 + SURVEY §3.2).

    Per epoch: dense tile inference over every training image (HOT LOOP #2)
    → count-driven top-k selection + ratio pruning → CE training on the
    selected tiles with frozen encoder (HOT LOOP #3). Validation scores
    dense val probs against count-derived tile labels. The checkpoint is
    written at the final epoch only, like the reference (:149-150).

    TPU shape: training images are uploaded to HBM once; inference batches
    and training-tile gathers never touch the host (only the [N, T] prob
    matrix and the selected-coordinate table cross PCIe).
    """
    import jax

    logger = logger or RunLogger(output_dir or "./output")
    h, w = train_source.image_hw
    coords = tile_grid(h, w, tile_size, interval)  # static grid
    # dense sweeps run through the serving engine when the encoder is
    # foldable (infer_engine="auto"): the encoder is frozen for the whole
    # stage-2 cycle, so BN folding + activation calibration stay valid and
    # only fc_tile is re-read per call (+24% measured on the bench loop)
    engine_kwargs = {}
    if infer_engine in ("q8", "q8g", "q8d", "q8dg", "auto"):
        engine_kwargs = dict(
            variables=variables, engine=infer_engine,
            calib_images=infer_engine_mod.pick_calib_images(train_source.images),
        )
    infer_fn = steps_mod.make_tile_infer_step(
        model, tile_size, coords, **engine_kwargs
    )
    stack_infer_fn = steps_mod.make_stack_tile_infer_step(
        model, tile_size, coords, mesh, **engine_kwargs
    )
    step_fn = steps_mod.make_tile_train_step(model, tile_size)

    # One-time HBM upload of the deduplicated image stack, REPLICATED across
    # the mesh by design: both hot loops gather random rows/tiles from it
    # (dense sweep + selected-tile training), and replication keeps those
    # gathers collective-free. LYSTO's full 20k×299²×3 u8 stack is ≈5.4 GB —
    # resident per v5e chip with room to spare; dp sharding happens on the
    # gathered batches, not the stack.
    if mesh is not None:
        from cellsegmentation_tpu.parallel.sharding import replicate_tree

        images_dev = replicate_tree(mesh, train_source.images)
    else:
        images_dev = jnp.asarray(train_source.images)

    # Schedules are step-functions; the per-epoch batch count varies with the
    # selection, so size the schedule from a nominal epoch length.
    nominal_steps = max(
        1, (len(train_source) * (topk_neg + 1)) // tile_batch_size
    )
    schedule = make_schedule(scheduler, lr, epochs, nominal_steps, t0=5)
    state = create_train_state(
        variables["params"],
        variables["batch_stats"],
        "tile",
        schedule,
        use_sgd=scheduler is not None,
        weight_decay=weight_decay,
    )
    if last_epoch:
        state = state.replace(
            step=jnp.asarray(last_epoch * nominal_steps, jnp.int32)
        )
    if resume_opt_state is not None:
        state = state.replace(
            opt_state=ckpt_mod.restore_opt_state(state.opt_state, resume_opt_state)
        )

    pc = jax.process_count()
    # every sweep batch must split EVENLY per process (an uneven lo/hi split
    # breaks the global shape make_array_from_process_local_data infers) and
    # stay a multiple of the mesh data axis for dp sharding
    if mesh is not None:
        from cellsegmentation_tpu.parallel.mesh import DATA_AXIS

        data_ax = int(mesh.shape[DATA_AXIS])
    else:
        data_ax = 1
    import math

    quantum = math.lcm(pc, data_ax)
    image_batch = -(-image_batch // quantum) * quantum

    def dense_probs(source) -> np.ndarray:
        """[N, T] tile probs for every image of ``source``.

        The sweep walks GLOBAL contiguous batches (identical on every
        process); for the training source images are gathered from the
        resident stack *inside* the jitted step with a dp sharding
        constraint, so each chip sweeps its own slice of the batch. At
        multi-host each process transfers/reads only its addressable rows
        and the full matrix is summed across hosts at the end (disjoint
        fills over a zero matrix).
        """
        n = len(source)
        # The non-train-source branch feeds mesh-global sharded image
        # arrays to the locally-jitted per-tile infer_fn, whose dense
        # engines do a HOST flip check (np.asarray) that cannot read
        # non-addressable shards. Unreachable today (dense_probs is only
        # called with train_source); fail loudly rather than mis-shard if
        # that ever changes at multi-host.
        if source is not train_source and pc > 1:
            raise NotImplementedError(
                "dense_probs over a non-train source is single-process "
                "only; route it through the stack-resident sweep instead"
            )
        flip = getattr(source, "flip_code", np.zeros(n, dtype=np.int32))
        base_idx = getattr(source, "base_idx", np.arange(n))
        out = np.zeros((n, coords.shape[0]), dtype=np.float32)
        idx_chunks, val_chunks = [], []
        it = BatchIterator(n, image_batch, shuffle=False)
        for sel, valid in it:
            # each process contributes its contiguous local slice of the
            # global batch (mesh device order groups a process's chips);
            # image_batch is pre-rounded so the split is always even
            assert len(sel) % pc == 0, (len(sel), pc)
            per = len(sel) // pc
            lo = jax.process_index() * per
            lsel = sel[lo : lo + per] if pc > 1 else sel
            if source is train_source:
                dev = _device_batch(
                    {
                        "idx": base_idx[lsel].astype(np.int32),
                        "flip": flip[lsel].astype(np.int32),
                    },
                    mesh,
                )
                probs = stack_infer_fn(
                    state.variables, images_dev, dev["idx"], dev["flip"]
                )
            else:
                dev = _device_batch(
                    {
                        "images": source.images[base_idx[lsel]],
                        "flip": flip[lsel].astype(np.int32),
                    },
                    mesh,
                )
                probs = infer_fn(state.variables, dev["images"], dev["flip"])
            if pc == 1:
                out[sel[valid]] = np.asarray(probs)[valid]
            else:
                for shard in probs.addressable_shards:
                    rows = sel[shard.index[0]]
                    v = valid[shard.index[0]]
                    vals = np.asarray(shard.data)[v]
                    out[rows[v]] = vals
                    idx_chunks.append(rows[v])
                    val_chunks.append(vals)
        # slim cross-host exchange: each host ships only the rows it
        # computed (≈ N/pc · T), not the whole [N, T] matrix
        multihost.merge_process_rows([out], idx_chunks, [val_chunks])
        return out

    last_metrics = None
    selections = [] if record_selection else None
    for epoch in range(1 + last_epoch, epochs + 1):
        try:
            # Schedules are sized from nominal_steps but the real per-epoch
            # batch count varies with the selection; realign the step counter
            # to the epoch boundary so cyclic schedules (OneCycle) keep their
            # peak placement and epoch-stepped schedules stay exact (the
            # reference steps per real batch over a scheduler sized from the
            # FIRST epoch's loader, train_tile.py:293 + train/train.py:38-45
            # — same within-epoch semantics, no cumulative drift). The LR is
            # schedule(state.step) by construction — apply_gradients scales
            # unit-lr optimizer updates (train/state.py) — so this realign
            # IS the schedule position.
            state = state.replace(
                step=jnp.asarray((epoch - 1) * nominal_steps, jnp.int32)
            )
            # 1) dense inference over every training tile
            probs = dense_probs(train_source)
            # 2) adaptive top-k selection + ratio pruning
            train_data = infer.sample_topk(
                train_source, probs, tile_size, interval,
                tiles_per_pos, topk_neg, pos_neg_ratio, seed=seed + epoch,
            )
            logger.info(
                f"[stage2 epoch {epoch}/{epochs}] sampled pos={train_data['n_pos']} "
                f"neg={train_data['n_neg']}"
            )
            if record_selection:
                selections.append({
                    k: np.asarray(train_data[k])
                    for k in ("img_idx", "xs", "ys", "label")
                })
            # 3) CE training over the selected tiles
            n_sel = len(train_data["label"])
            it = _host_iter(
                n_sel,
                min(tile_batch_size, max(n_sel, 1)),
                mesh,
                shuffle=True,
                seed=seed + epoch,
            )
            pipe = _MetricsPipe()
            for sel, valid in it:
                batch = _device_batch(
                    {
                        "img_idx": train_data["img_idx"][sel],
                        "xs": train_data["xs"][sel],
                        "ys": train_data["ys"][sel],
                        "flip": train_data["flip"][sel],
                        "label": train_data["label"][sel],
                        "valid": valid,
                    },
                    mesh,
                )
                state, metrics = step_fn(state, images_dev, batch)
                pipe.push(metrics)
            loss = pipe.means().get("loss", 0.0)
            logger.info(f"  tile loss: {loss:.4f}")
            logger.csv_row("tile-training", ["epoch", "tile_loss"], [epoch, loss])
            logger.scalar("tile/loss", loss, epoch)

            if (val_source is not None and len(val_source) > 0
                    and epoch % test_every == 0):
                val_probs = infer.inference_tiles(
                    val_source, infer_fn, state.variables, tile_size, interval,
                    image_batch=image_batch,
                )
                m = eval_mod.evaluate_tile(
                    val_source.labels, val_probs, tiles_per_pos, threshold
                )
                last_metrics = m
                logger.info(
                    f"  tile error: {m[0]:.4f} | FPR: {m[1]:.4f} | FNR: {m[2]:.4f}"
                )
                logger.csv_row(
                    "tile-validation",
                    ["epoch", "tile_error", "tile_fpr", "tile_fnr"],
                    [epoch, *m],
                )
                logger.scalars(
                    {"tile/err": m[0], "tile/fpr": m[1], "tile/fnr": m[2]}, epoch
                )

            if output_dir and epoch >= epochs:
                ckpt_mod.save_checkpoint(
                    output_dir, "tile", epoch, encoder_name,
                    state.params, state.batch_stats,
                    opt_state=state.opt_state, step=int(state.step),
                )
        except KeyboardInterrupt:
            if output_dir:
                ckpt_mod.save_checkpoint(
                    output_dir, "tile", epoch, encoder_name,
                    state.params, state.batch_stats,
                    opt_state=state.opt_state, step=int(state.step),
                )
            logger.info(f"interrupted at epoch {epoch}; checkpoint saved")
            raise

    return Stage2Result(
        state=state, last_metrics=last_metrics, selections=selections
    )


def draw_pseudo_masks(
    model: MILNet,
    variables: dict,
    source,
    *,
    tile_size: int = 16,
    interval: int = 5,
    threshold: float = 0.95,
    image_batch: int = 64,
    preprocess: bool = False,
    output_path: Optional[str] = None,
    logger: Optional[RunLogger] = None,
    engine: str = "auto",
    infer_tiles_fn=None,
) -> np.ndarray:
    """Stage-3 pseudo-mask generation (reference: train_seg.py:219-276).

    Dense tile inference on the 16/5 grid → keep tiles with prob > threshold
    → artifact clearing (drop tiles on images whose predicted count is 0,
    via the image head) → paint tile blocks (+ optional HSV refinement).
    Returns [N, H, W] uint8 masks.

    ``infer_tiles_fn``: an already-built tile-inference step (from
    make_tile_infer_step with the matching grid/engine) — pass it to reuse
    one engine build across repeated sweeps; the q8 build (weight fold +
    calibration + compile) is a few seconds of one-time cost that a fresh
    build pays on every call (docs/PERF.md stage-3 decomposition).

    Single-process runs stream the whole thing: each uint8 image batch
    crosses host→device ONCE and serves both the tile sweep and the count
    head, and the host paints/refines/saves batch i's masks while the
    device sweeps batch i+1 (2-deep pipeline). Multi-host runs keep the
    merge-then-paint orchestration: the sweep is disjoint round-robin and
    shipping [N, T] probs + counts across hosts is far cheaper than
    shipping painted [N, H, W] masks.
    """
    from cellsegmentation_tpu.postprocess.masks import (
        generate_masks,
        paint_tile_blocks,
        preprocess_masks_batch,
        save_mask_pairs,
    )

    logger = logger or RunLogger(output_path or "./output")
    h, w = source.image_hw
    # the 16/5 grid is the densest sweep in the pipeline (~3.3k tiles/image)
    # — the serving engine pays off most here (encoder frozen at this point)
    if infer_tiles_fn is None:
        infer_tiles_fn = steps_mod.make_tile_infer_step(
            model, tile_size, tile_grid(h, w, tile_size, interval),
            variables=variables, engine=engine,
            calib_images=infer_engine_mod.pick_calib_images(source.images),
        )
    infer_image_fn = steps_mod.make_image_infer_step(model)
    coords = tile_grid(h, w, tile_size, interval)
    n = len(source)
    base_idx = getattr(source, "base_idx", np.arange(n))

    if jax.process_count() > 1:
        # fused sweep: one upload per batch serves both the dense tile
        # probs and the image-head counts (artifact clearing below)
        probs, counts = infer.inference_tiles_and_counts(
            source, infer_tiles_fn, infer_image_fn, variables,
            tile_size, interval, image_batch=image_batch,
        )  # [N, T], [N]
        keep = probs > threshold  # (reference rank(): lexsort + filter)
        # artifact clearing: predicted count == 0 → drop the image's tiles
        keep &= (counts != 0)[:, None]
        groups, tile_idx = np.nonzero(keep)
        logger.info(
            f"pseudo-masks: {keep.sum()} tiles kept on "
            f"{len(np.unique(groups))}/{n} images"
        )
        return generate_masks(
            source.images[base_idx],
            groups,
            coords[tile_idx],
            tile_size,
            preprocess=preprocess,
            save_masks=output_path is not None,
            output_path=output_path or "./data/pseudomask",
        )

    # single process: streamed threshold/clear/paint per batch — the host
    # paints/refines/saves batch i while the device sweeps batch i+1
    # (infer.iter_tiles_and_counts owns the fused upload + 2-deep pipeline)
    masks = np.zeros((n, h, w), dtype=np.uint8)
    kept_tiles = 0
    kept_images = 0
    for rows, probs_b, counts_b in infer.iter_tiles_and_counts(
        source, infer_tiles_fn, infer_image_fn, variables,
        image_batch=image_batch,
    ):
        keep = probs_b > threshold  # (reference rank(): lexsort + filter)
        # artifact clearing: predicted count == 0 → drop the image's tiles
        keep &= (counts_b != 0)[:, None]
        groups, tile_idx = np.nonzero(keep)
        kept_tiles += len(groups)
        kept_images += len(np.unique(groups))
        imgs = source.images[base_idx[rows]]
        m = paint_tile_blocks(
            len(imgs), (h, w), groups, coords[tile_idx], tile_size
        )
        if preprocess:
            m = preprocess_masks_batch(imgs, m)
        masks[rows] = m.astype(np.uint8)
        if output_path:
            save_mask_pairs(output_path, rows, imgs, m)
    logger.info(
        f"pseudo-masks: {kept_tiles} tiles kept on {kept_images}/{n} images"
    )
    return masks


def train_stage3(
    model: MILNet,
    variables: dict,
    mask_source,
    *,
    epochs: int = 30,
    batch_size: int = 32,
    lr: float = 5e-5,
    weight_decay: float = 1e-4,
    scheduler: Optional[str] = None,
    encoder_name: str = "resnet50",
    output_dir: Optional[str] = None,
    logger: Optional[RunLogger] = None,
    mesh=None,
    seed: int = 42,
    last_epoch: int = 0,
    resume_opt_state=None,
) -> Stage3Result:
    """PT.3 segmentation-decoder training (reference: train_seg.py:75-151).

    Dice loss on the positive softmax channel; CE logged alongside; decoder
    params train, encoder stats update; checkpoint at the final epoch.
    """
    logger = logger or RunLogger(output_dir or "./output")
    batch_size = _mesh_batch_size(batch_size, mesh)
    it = _host_iter(len(mask_source), batch_size, mesh, shuffle=True, seed=seed)
    schedule = make_schedule(scheduler, lr, epochs, len(it), t0=5)
    state = create_train_state(
        variables["params"],
        variables["batch_stats"],
        "segment",
        schedule,
        use_sgd=scheduler is not None,
        weight_decay=weight_decay,
    )
    if last_epoch:
        state = state.replace(step=jnp.asarray(last_epoch * len(it), jnp.int32))
        it.fast_forward(last_epoch)
    if resume_opt_state is not None:
        state = state.replace(
            opt_state=ckpt_mod.restore_opt_state(state.opt_state, resume_opt_state)
        )
    step_fn = steps_mod.make_seg_train_step(model)
    base_rng = jax.random.PRNGKey(seed)

    last_loss = None
    for epoch in range(1 + last_epoch, epochs + 1):
        try:
            pipe = _MetricsPipe()
            # per-epoch seeded so a resumed run draws the same flips the
            # uninterrupted run would have at this epoch
            aug_rng = np.random.default_rng(seed + epoch)
            for sel, valid in it:
                flips = (
                    aug_rng.integers(0, 4, size=len(sel)).astype(np.int32)
                    if mask_source.augment
                    else np.zeros(len(sel), dtype=np.int32)
                )
                masks = mask_source.masks[sel]
                # flip masks to match the on-device image flips
                mh = (flips == 1) | (flips == 3)
                mv = (flips == 2) | (flips == 3)
                masks = np.where(mh[:, None, None], masks[:, :, ::-1], masks)
                masks = np.where(mv[:, None, None], masks[:, ::-1, :], masks)
                batch = _device_batch(
                    {
                        "images": mask_source.images[sel],
                        "flip": flips,
                        "mask": masks.astype(np.int32),
                        "valid": valid,
                    },
                    mesh,
                )
                state, metrics = step_fn(state, batch, base_rng)
                pipe.push(metrics)
            means = pipe.means()
            last_loss = means.get("loss")
            logger.info(
                f"[stage3 epoch {epoch}/{epochs}] "
                + " | ".join(f"{k}: {v:.4f}" for k, v in means.items())
            )
            logger.csv_row(
                "seg-training", ["epoch", "seg_loss_ce", "seg_loss_dice"],
                [epoch, means.get("loss_ce", 0), means.get("loss_dice", 0)],
            )
            logger.scalars({f"seg/{k}": v for k, v in means.items()}, epoch)

            if output_dir and epoch >= epochs:
                ckpt_mod.save_checkpoint(
                    output_dir, "segment", epoch, encoder_name,
                    state.params, state.batch_stats,
                    opt_state=state.opt_state, step=int(state.step),
                )
        except KeyboardInterrupt:
            if output_dir:
                ckpt_mod.save_checkpoint(
                    output_dir, "segment", epoch, encoder_name,
                    state.params, state.batch_stats,
                    opt_state=state.opt_state, step=int(state.step),
                )
            logger.info(f"interrupted at epoch {epoch}; checkpoint saved")
            raise

    return Stage3Result(state=state, last_loss=last_loss)
