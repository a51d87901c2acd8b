"""Folded-BN inference engine: numerical equivalence with model.apply.

The Pallas fused-bottleneck path only exists on real TPUs; on the CPU test
backend the engine exercises its lax fallback (use_pallas is moot because
fused_bottleneck_chain is gated to TPU-compatible shapes — on CPU we force
the plain path), which still validates the BN folding and the plain
bottleneck math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.data.batches import normalize_images
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops import infer_engine


@pytest.fixture(scope="module")
def resnet50_small():
    model = build_model("resnet50", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    return model, variables


def test_fold_conv_bn_math():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(1, 1, 4, 8)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bias = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    w, b = infer_engine.fold_conv_bn(k, scale, bias, mean, var)
    x = rng.normal(size=(3, 4)).astype(np.float32)
    direct = (x @ k[0, 0] - mean) / np.sqrt(var + 1e-5) * scale + bias
    folded = x @ np.asarray(w, np.float32)[0, 0] + np.asarray(b)
    # folded weights are stored in bf16 (~0.4% quantization)
    np.testing.assert_allclose(folded, direct, rtol=2e-2, atol=2e-2)


def test_engine_matches_flax_apply(resnet50_small):
    model, variables = resnet50_small
    built = infer_engine.make_fast_tile_logits(model, variables)
    assert built is not None
    fast_logits, trunk_tree = built

    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.integers(0, 255, size=(8, 32, 32, 3), dtype=np.uint8))
    flip = jnp.zeros((8,), jnp.int32)
    x = normalize_images(tiles, flip)  # f32 on CPU for tight comparison

    def fast(head, tree, x):
        return fast_logits(head, tree, x.astype(jnp.bfloat16))

    got = np.asarray(
        jax.jit(fast)(variables["params"]["fc_tile"], trunk_tree, x)
    )
    want = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, mode="tile", train=False))(
            variables, x
        )
    )
    # bf16 folded weights vs f32 flax: agreement within bf16 noise
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.3 * np.abs(want).mean())


def test_engine_rejects_unsupported_archs():
    model = build_model("resnext50_32x4d", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    assert infer_engine.make_fast_tile_logits(model, variables) is None
    model = build_model("efficientnet_b0", policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    assert infer_engine.make_fast_tile_logits(model, variables) is None
