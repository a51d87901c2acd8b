"""Learning-rate schedules.

Reproduces the reference's scheduler menu (reference: train_image.py:487-506):
- OneCycleLR:  max_lr = lr, div_factor 25, pct_start 0.3, final lr ~0
- ExponentialLR: gamma 0.9, stepped per *epoch*
- CosineAnnealingWarmRestarts: stepped per epoch; T_0 = 10 epochs for
  stage 1 / ensemble (train_image.py:504, train_ensemble.py:233) but 5 for
  stages 2-3 (train_tile.py:299, train_seg.py:308) — callers pass ``t0``

In torch, cyclic schedulers step per batch and the others per epoch
(reference: train/train.py:38-45, 85-92). Optax schedules are pure functions
of the *update step*, so epoch-stepped schedules quantize the step count by
steps_per_epoch — identical trajectories, no mutable scheduler object to
checkpoint (resume restores the step counter instead).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def make_schedule(
    name: Optional[str],
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    t0: int = 10,
) -> optax.Schedule:
    if name is None:
        return lambda step: base_lr
    if name == "OneCycleLR":
        # optax's onecycle builds a piecewise interpolation whose warmup
        # interval is int(pct_start*total); below 4 total steps it is
        # empty and the 0/0 makes the schedule nan at EVERY step (debug
        # runs then nan-train silently)
        total = max(epochs * steps_per_epoch, 4)
        return optax.cosine_onecycle_schedule(
            transition_steps=total,
            peak_value=base_lr,
            pct_start=0.3,
            div_factor=25.0,
            final_div_factor=1e4,
        )
    if name == "ExponentialLR":
        def sched(step):
            epoch = step // steps_per_epoch
            return base_lr * jnp.power(0.9, epoch)
        return sched
    if name == "CosineAnnealingWarmRestarts":
        def sched(step):
            epoch = step // steps_per_epoch
            t_cur = epoch % t0
            return 0.5 * base_lr * (1 + jnp.cos(jnp.pi * t_cur / t0))
        return sched
    raise ValueError(f"unknown scheduler {name!r}")
