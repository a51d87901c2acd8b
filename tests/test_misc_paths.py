"""Coverage for remaining paths: torch ckpt conversion end-to-end, the
alternative train step, summary tool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.train import checkpoint as ckpt_mod
from cellsegmentation_tpu.train import create_train_state, make_schedule, steps


def test_convert_checkpoint_roundtrip(tmp_path):
    """torch .pth -> our ckpt -> restore_into -> encoder params land intact."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import TBasic, TResNet, _randomize
    from cellsegmentation_tpu.utils import torch_convert

    tmodel = TResNet(TBasic, (2, 2, 2, 2))
    _randomize(tmodel, seed=3)
    pth = str(tmp_path / "resnet18.pth")
    torch.save(tmodel.state_dict(), pth)

    out = torch_convert.convert_checkpoint("resnet18", pth, str(tmp_path))
    ckpt = ckpt_mod.load_checkpoint(out)
    assert ckpt["encoder"] == "resnet18"
    assert ckpt["extra"]["pretrained"] == "imagenet"

    model = build_model("resnet18", policy=F32_POLICY)
    fresh = init_variables(model, jax.random.PRNGKey(0))
    params, stats = ckpt_mod.restore_into(fresh["params"], fresh["batch_stats"], ckpt)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["conv1"]["kernel"]),
        np.transpose(tmodel.conv1.weight.detach().numpy(), (2, 3, 1, 0)),
        rtol=1e-6,
    )
    # heads stay freshly initialized (strict=False semantics)
    np.testing.assert_array_equal(
        np.asarray(params["fc_tile"]["Dense_0"]["kernel"]),
        np.asarray(fresh["params"]["fc_tile"]["Dense_0"]["kernel"]),
    )
    # and the restored tree actually runs
    logits = jax.jit(
        lambda v, x: model.apply(v, x, mode="tile", train=False)
    )({"params": params, "batch_stats": stats}, jnp.zeros((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(logits)).all()


def test_alternative_train_step(rng):
    """Per-batch tile+image alternation (reference train_alternative parity):
    both heads and the encoder move, each through its own masked optimizer."""
    model = build_model("resnet18", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    host = jax.tree_util.tree_map(np.asarray, variables)
    sched = make_schedule(None, 1e-3, 2, 2)
    tile_state = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, host["params"]),
        jax.tree_util.tree_map(jnp.asarray, host["batch_stats"]),
        "tile", sched,
    )
    image_state = create_train_state(
        tile_state.params, tile_state.batch_stats, "image", sched
    )
    step = steps.make_alternative_train_step(model, tile_size=16)

    images_dev = jnp.asarray(
        rng.integers(0, 255, size=(4, 48, 48, 3), dtype=np.uint8)
    )
    batch = {
        "images": images_dev,
        "flip": jnp.zeros((4,), jnp.int32),
        "cls": jnp.asarray(rng.integers(0, 7, size=4)),
        "reg": jnp.asarray(rng.integers(0, 9, size=4).astype(np.float32)),
        "valid": jnp.ones((4,), bool),
        "img_idx": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "xs": jnp.asarray([0, 8, 16, 24], jnp.int32),
        "ys": jnp.asarray([0, 8, 16, 24], jnp.int32),
        "tflip": jnp.zeros((4,), jnp.int32),
        "tlabel": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "tvalid": jnp.ones((4,), bool),
    }
    tile_state, image_state, metrics = step(
        tile_state, image_state, images_dev, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))

    def changed(part):
        return any(
            not np.allclose(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(host["params"][part]),
                jax.tree_util.tree_leaves(image_state.params[part]),
            )
        )

    assert changed("fc_tile")       # tile phase updated the tile head
    assert changed("encoder")       # image phase updated the encoder
    assert changed("fc_image_reg")
    assert not changed("seg_decoder")


def test_summary_counts():
    from cellsegmentation_tpu.utils.summary import summary

    counts = summary("resnet18")
    assert counts["encoder"] == pytest.approx(11_176_512, rel=0.01)  # resnet18 trunk
    assert counts["fc_tile"] == 512 * 2 + 2
    assert counts["TOTAL"] == sum(v for k, v in counts.items() if k != "TOTAL")
