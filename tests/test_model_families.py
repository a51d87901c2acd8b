"""Train-step smoke coverage for the non-ResNet encoder families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.train import create_train_state, make_schedule, steps


@pytest.mark.parametrize("name", ["resnext50_32x4d", "efficientnet_b0"])
def test_image_train_step_runs(name, rng):
    model = build_model(name, policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sched = make_schedule(None, 1e-3, 2, 2)
    state = create_train_state(
        variables["params"], variables["batch_stats"], "image", sched
    )
    step = steps.make_image_train_step(model)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, size=(2, 32, 32, 3), dtype=np.uint8)
        ),
        "flip": jnp.zeros((2,), jnp.int32),
        "cls": jnp.asarray(rng.integers(0, 7, size=2)),
        "reg": jnp.asarray(rng.integers(0, 20, size=2).astype(np.float32)),
        "valid": jnp.ones((2,), bool),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_resnext_segment_step_runs(rng):
    """The reference's ResNeXt seg decoder is shape-broken
    (model/resnext.py:207-217); ours must actually train."""
    model = build_model("resnext50_32x4d", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sched = make_schedule(None, 1e-3, 2, 2)
    state = create_train_state(
        variables["params"], variables["batch_stats"], "segment", sched
    )
    step = steps.make_seg_train_step(model)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)
        ),
        "flip": jnp.zeros((1,), jnp.int32),
        "mask": jnp.asarray(rng.integers(0, 2, size=(1, 32, 32)), jnp.int32),
        "valid": jnp.ones((1,), bool),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert 0 <= float(metrics["loss_dice"]) <= 1


def test_efficientnet_tile_step_runs(rng):
    model = build_model("efficientnet_b0", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sched = make_schedule(None, 1e-3, 2, 2)
    state = create_train_state(
        variables["params"], variables["batch_stats"], "tile", sched
    )
    step = steps.make_tile_train_step(model, tile_size=16)
    images_dev = jnp.asarray(
        rng.integers(0, 255, size=(2, 48, 48, 3), dtype=np.uint8)
    )
    batch = {
        "img_idx": jnp.asarray([0, 1], jnp.int32),
        "xs": jnp.asarray([0, 16], jnp.int32),
        "ys": jnp.asarray([8, 24], jnp.int32),
        "flip": jnp.asarray([0, 3], jnp.int32),
        "label": jnp.asarray([0, 1], jnp.int32),
        "valid": jnp.ones(2, bool),
    }
    state, metrics = step(state, images_dev, batch)
    assert np.isfinite(float(metrics["loss"]))
