"""Host-side epoch orchestration for the three training stages.

Structure follows the reference call stacks (SURVEY §3): jitted steps do the
math, the host loop owns data-dependent control flow (epoch-level
re-sampling, validation cadence, checkpointing) so nothing recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cellsegmentation_tpu import evaluate as eval_mod
from cellsegmentation_tpu import infer
from cellsegmentation_tpu.data.batches import BatchIterator
from cellsegmentation_tpu.data.lysto import LystoDataSource
from cellsegmentation_tpu.models.milnet import MILNet
from cellsegmentation_tpu.ops.tiles import tile_grid
from cellsegmentation_tpu.parallel.sharding import shard_batch
from cellsegmentation_tpu.train import checkpoint as ckpt_mod
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.schedules import make_schedule
from cellsegmentation_tpu.train.state import MILTrainState, create_train_state
from cellsegmentation_tpu.utils.logging import RunLogger


@dataclasses.dataclass
class Stage1Result:
    state: MILTrainState
    last_metrics: Optional[tuple] = None  # (mAP, mse, qwk)


def _device_batch(batch: dict, mesh=None) -> dict:
    if mesh is not None:
        return shard_batch(mesh, batch)
    return jax.tree_util.tree_map(jnp.asarray, batch)


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
    it = BatchIterator(len(train_source), batch_size, shuffle=True, seed=seed)
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
    if resume_opt_state is not None:
        state = state.replace(
            opt_state=resume_opt_state,
            step=jnp.asarray(last_epoch * steps_per_epoch, jnp.int32),
        )
    step_fn = steps_mod.make_image_train_step(model, heads=heads)
    infer_fn = steps_mod.make_image_infer_step(model)
    base_rng = jax.random.PRNGKey(seed)

    last_metrics = None
    cls_labels = train_source.cls_labels
    for epoch in range(1 + last_epoch, epochs + 1):
        try:
            sums = {}
            n_batches = 0
            cls_labels = train_source.cls_labels  # refresh after resampling
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
                for k, v in metrics.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                n_batches += 1
            means = {k: v / max(n_batches, 1) for k, v in sums.items()}
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

            if val_source is not None and epoch % test_every == 0:
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
                    it = BatchIterator(
                        len(train_source), batch_size, shuffle=True, seed=seed + epoch
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
                    step=int(state.step),
                )
        except KeyboardInterrupt:
            if output_dir:
                ckpt_mod.save_checkpoint(
                    output_dir, "image", epoch, encoder_name,
                    state.params, state.batch_stats, step=int(state.step),
                )
            logger.info(f"interrupted at epoch {epoch}; checkpoint saved")
            raise

    return Stage1Result(state=state, last_metrics=last_metrics)
