"""Model geometry and mode-switch tests.

Shape spec from the reference's annotated forward
(reference: model/resnet.py:236-303): for 299² input the encoder pyramid is
150/75/75/38/19/10 and the seg output returns to 299²; a 32² tile collapses
to a 1×1 map at x4.

Geometry checks use ``jax.eval_shape`` (no FLOPs); numeric behavior checks
run jitted at tiny sizes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.models import build_model, init_variables, MODEL_NAMES


def _struct(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _abstract_vars(model, hw=(32, 32)):
    """Variable-tree *shapes* without running any compute."""

    def init_all(mdl):
        dummy = jnp.zeros((1, *hw, 3), mdl.policy.compute_dtype)
        mdl(dummy, mode="image", train=False)
        mdl(dummy, mode="tile", train=False)
        if mdl.supports_segment:
            mdl(dummy, mode="segment", train=False)

    return jax.eval_shape(
        lambda k: model.init({"params": k, "dropout": k}, method=init_all),
        jax.random.PRNGKey(0),
    )


def _abstract_apply(model, variables, x_shape, **kwargs):
    return jax.eval_shape(
        functools.partial(model.apply, **kwargs), variables, _struct(*x_shape)
    )


@pytest.fixture(scope="module")
def resnet18():
    model = build_model("resnet18", policy=F32_POLICY)
    return model, init_variables(model, jax.random.PRNGKey(0))


class TestParamTree:
    def test_partitions_exist(self):
        model = build_model("resnet18", policy=F32_POLICY)
        variables = _abstract_vars(model)
        assert set(variables["params"].keys()) == {
            "encoder",
            "fc_tile",
            "fc_image_cls",
            "fc_image_reg",
            "seg_decoder",
        }
        assert "batch_stats" in variables

    @pytest.mark.parametrize("name", MODEL_NAMES)
    def test_all_models_partitions(self, name):
        model = build_model(name, policy=F32_POLICY)
        variables = _abstract_vars(model)
        top = set(variables["params"].keys())
        expected = {"encoder", "fc_tile", "fc_image_cls", "fc_image_reg"}
        if model.supports_segment:
            expected.add("seg_decoder")
        assert top == expected

    def test_efficientnet_has_no_seg(self):
        model = build_model("efficientnet_b0", policy=F32_POLICY)
        assert "seg_decoder" not in _abstract_vars(model)["params"]


class TestModeOutputShapes:
    @pytest.mark.parametrize("name", MODEL_NAMES)
    def test_image_and_tile_modes(self, name):
        model = build_model(name, policy=F32_POLICY)
        variables = _abstract_vars(model)
        cls_out, reg_out = _abstract_apply(
            model, variables, (2, 299, 299, 3), mode="image", train=False
        )
        assert cls_out.shape == (2, 7)
        assert reg_out.shape == (2, 1)
        logits = _abstract_apply(
            model, variables, (5, 32, 32, 3), mode="tile", train=False
        )
        assert logits.shape == (5, 2)

    @pytest.mark.parametrize(
        "name", [n for n in MODEL_NAMES if not n.startswith("efficientnet")]
    )
    def test_segment_mode(self, name):
        model = build_model(name, policy=F32_POLICY)
        variables = _abstract_vars(model)
        seg = _abstract_apply(
            model, variables, (1, 299, 299, 3), mode="segment", train=False
        )
        assert seg.shape == (1, 299, 299, 2)

    def test_efficientnet_segment_raises(self):
        model = build_model("efficientnet_b0", policy=F32_POLICY)
        variables = _abstract_vars(model)
        with pytest.raises(NotImplementedError):
            _abstract_apply(
                model, variables, (1, 64, 64, 3), mode="segment", train=False
            )


class TestEncoderGeometry:
    @pytest.mark.parametrize(
        "name,feat_dim",
        [("resnet18", 512), ("resnet50", 2048), ("resnext50_32x4d", 2048)],
    )
    def test_pyramid_299(self, name, feat_dim):
        model = build_model(name, policy=F32_POLICY)
        enc = model.encoder
        variables = jax.eval_shape(
            lambda k, x: enc.init(k, x, train=False),
            jax.random.PRNGKey(0),
            _struct(1, 299, 299, 3),
        )
        x4, x3, x2, x1 = jax.eval_shape(
            functools.partial(enc.apply, train=False), variables, _struct(1, 299, 299, 3)
        )
        assert x4.shape[1:3] == (10, 10) and x4.shape[-1] == feat_dim
        assert x3.shape[1:3] == (19, 19)
        assert x2.shape[1:3] == (38, 38)
        assert x1.shape[1:3] == (75, 75)

    def test_tile_collapses_to_1x1(self):
        model = build_model("resnet50", policy=F32_POLICY)
        enc = model.encoder
        variables = jax.eval_shape(
            lambda k, x: enc.init(k, x, train=False),
            jax.random.PRNGKey(0),
            _struct(1, 32, 32, 3),
        )
        x4, _, _, _ = jax.eval_shape(
            functools.partial(enc.apply, train=False), variables, _struct(1, 32, 32, 3)
        )
        assert x4.shape[1:3] == (1, 1)

    def test_efficientnet_feature_dim(self):
        # B0 widens to 4*320=1280; B2 (width 1.1) to 4*352=1408
        assert build_model("efficientnet_b0").encoder.feature_dim == 1280
        assert build_model("efficientnet_b2").encoder.feature_dim == 1408


class TestNumericBehavior:
    def test_reg_head_is_nonnegative(self, resnet18):
        model, variables = resnet18
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
        apply = jax.jit(
            functools.partial(model.apply, mode="image", train=False)
        )
        _, reg_out = apply(variables, x)
        assert (np.asarray(reg_out) >= 0).all()

    def test_freeze_encoder_stats_keeps_stats(self, resnet18):
        model, variables = resnet18
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        # tile-mode training with the freeze_bn trick: batch_stats must come
        # back bit-identical (reference behavior: model/resnet.py:252-257)
        apply = jax.jit(
            functools.partial(
                model.apply,
                mode="tile",
                train=True,
                freeze_encoder_stats=True,
                mutable=["batch_stats"],
            )
        )
        _, mutated = apply(variables, x, rngs={"dropout": jax.random.PRNGKey(3)})
        for b, a in zip(
            jax.tree_util.tree_leaves(variables["batch_stats"]),
            jax.tree_util.tree_leaves(mutated["batch_stats"]),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def test_train_mode_updates_stats(self, resnet18):
        model, variables = resnet18
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 3 + 1
        apply = jax.jit(
            functools.partial(
                model.apply, mode="image", train=True, mutable=["batch_stats"]
            )
        )
        _, mutated = apply(variables, x, rngs={"dropout": jax.random.PRNGKey(3)})
        before = np.concatenate(
            [np.ravel(l) for l in jax.tree_util.tree_leaves(variables["batch_stats"])]
        )
        after = np.concatenate(
            [np.ravel(l) for l in jax.tree_util.tree_leaves(mutated["batch_stats"])]
        )
        assert not np.allclose(before, after)


def test_all_model_names_buildable():
    for name in MODEL_NAMES:
        build_model(name)
