"""Train state with per-stage masked optimization.

The reference freezes modules by flipping ``requires_grad`` inside ``setmode``
(reference: model/resnet.py:308-333). Functionally that means: per stage, a
subset of the top-level param partitions receives updates and the rest is
identity. We express this with ``optax.multi_transform`` over labels derived
from the top-level tree keys:

    stage "image":   encoder + fc_image_cls + fc_image_reg    (resnet.py:320-324)
    stage "tile":    fc_tile only                              (resnet.py:315-319)
    stage "segment": seg_decoder only                          (resnet.py:325-329)

plus the reference's optimizer selection: Adam when no scheduler, SGD with
momentum 0.9 when a scheduler is given (reference: train_image.py:508).
Weight decay uses torch semantics (L2 added to the gradient, so it flows
through momentum) — optax.add_decayed_weights before the optimizer core.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from cellsegmentation_tpu.models.milnet import (
    ENCODER_KEY,
    IMAGE_CLS_KEY,
    IMAGE_REG_KEY,
    SEG_KEY,
    TILE_KEY,
)

STAGE_TRAINABLE = {
    "image": (ENCODER_KEY, IMAGE_CLS_KEY, IMAGE_REG_KEY),
    "image_cls": (ENCODER_KEY, IMAGE_CLS_KEY),
    "image_reg": (ENCODER_KEY, IMAGE_REG_KEY),
    "tile": (TILE_KEY,),
    "segment": (SEG_KEY,),
}


def stage_trainable_partitions(stage: str) -> tuple[str, ...]:
    return STAGE_TRAINABLE[stage]


class MILTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # LR schedule applied at ``step`` (the optimizer core runs at lr=1.0).
    # Driving the schedule from state.step — instead of optax's internal
    # ScaleBySchedule count — makes the trainers' epoch-boundary/resume
    # step realignments actually move the LR position (stage-2's selection
    # size varies per epoch, so its real batch count drifts from the
    # nominal the schedule was sized with).
    schedule: Any = flax.struct.field(pytree_node=False, default=None)

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_gradients(self, grads: Any, new_batch_stats: Any) -> "MILTrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        if self.schedule is not None:
            # sgd/adam are chain(..., scale_by_learning_rate(lr)): the lr
            # multiply commutes out of the chain, so scaling the unit-lr
            # updates here is bit-identical math to baking lr in
            lr = jnp.asarray(self.schedule(self.step), jnp.float32)
            updates = jax.tree_util.tree_map(
                lambda u: (u.astype(jnp.float32) * lr).astype(u.dtype), updates
            )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    stage: str,
    params: Any,
    use_sgd: bool = False,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Per-stage masked optimizer (frozen partitions get zero updates).

    Runs at unit learning rate: MILTrainState.apply_gradients multiplies
    the updates by schedule(state.step), so the schedule position is the
    state's step counter (realignable at epoch boundaries / resume), not
    an optax-internal count."""
    trainable = set(stage_trainable_partitions(stage))

    if use_sgd:
        core = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(1.0, momentum=momentum),
        )
    else:
        core = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(1.0),
        )

    labels = {k: ("train" if k in trainable else "freeze") for k in params.keys()}
    return optax.multi_transform(
        {"train": core, "freeze": optax.set_to_zero()}, labels
    )


def create_train_state(
    params: Any,
    batch_stats: Any,
    stage: str,
    schedule: optax.Schedule,
    use_sgd: bool = False,
    weight_decay: float = 1e-4,
) -> MILTrainState:
    tx = make_optimizer(stage, params, use_sgd, weight_decay)
    return MILTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        schedule=schedule,
    )
