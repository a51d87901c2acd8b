"""Serving engine (q8): BN folding math + numerical/ranking fidelity vs
model.apply. The engine is pure XLA (all-conv trunk + int8 activation
sandwiches), so the CPU backend runs the exact production graph."""

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


def _engine_and_ref_probs(model, variables, calibrated):
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(rng.integers(0, 255, size=(64, 32, 32, 3), dtype=np.uint8))
    flip = jnp.zeros((64,), jnp.int32)
    x = normalize_images(tiles, flip)

    calib = np.asarray(x[:16], np.float32) if calibrated else None
    built = infer_engine.make_fast_tile_logits(model, variables, calib_tiles=calib)
    assert built is not None
    fast_logits, trunk_tree = built

    got = np.asarray(
        jax.jit(lambda h, t, v: fast_logits(h, t, v.astype(jnp.bfloat16)))(
            variables["params"]["fc_tile"], trunk_tree, x
        )
    )
    want = np.asarray(
        jax.jit(lambda v, xx: model.apply(v, xx, mode="tile", train=False))(
            variables, x
        )
    )
    return got, want


def test_plain_folded_engine_matches_flax(resnet50_small):
    model, variables = resnet50_small
    got, want = _engine_and_ref_probs(model, variables, calibrated=False)
    # bf16 folded weights vs f32 flax: agreement within bf16 noise
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.3 * np.abs(want).mean())


def test_q8_engine_ranking_fidelity(resnet50_small):
    """The q8 sandwiches must preserve the top-k tile *ranking* that drives
    stage-2 selection (reference behavior spec: inference.py:31-43)."""
    model, variables = resnet50_small
    got, want = _engine_and_ref_probs(model, variables, calibrated=True)
    m_g = got[:, 1] - got[:, 0]
    m_w = want[:, 1] - want[:, 0]
    # random-init nets are the quantization worst case (outlier-stretched
    # absmax scales) and random tiles produce near-tie margins, so assert
    # rank correlation rather than exact top-k membership; trained encoders
    # track far tighter (the bench's real-batch top-5% overlap is 1.000)
    assert np.corrcoef(m_g, m_w)[0, 1] > 0.9
    rank_g = np.argsort(np.argsort(m_g))
    rank_w = np.argsort(np.argsort(m_w))
    assert np.corrcoef(rank_g, rank_w)[0, 1] > 0.85


@pytest.mark.parametrize("arch", ["resnet18", "resnext50_32x4d",
                                  "efficientnet_b0"])
def test_engine_folds_basic_and_grouped(arch):
    """Round-3 extension (VERDICT #4): BasicBlock, grouped-Bottleneck and
    MBConv trunks get the folded fast path too, with ranking fidelity held
    (reference archs: model/resnet.py:22-49, model/resnext.py:418-442,
    model/efficientnet.py:81-122 — ops/effnet_engine.py)."""
    model = build_model(arch, policy=F32_POLICY)
    variables = init_variables(model, jax.random.PRNGKey(0))
    got, want = _engine_and_ref_probs(model, variables, calibrated=True)
    m_g = got[:, 1] - got[:, 0]
    m_w = want[:, 1] - want[:, 0]
    assert np.corrcoef(m_g, m_w)[0, 1] > 0.9
    rank_g = np.argsort(np.argsort(m_g))
    rank_w = np.argsort(np.argsort(m_w))
    assert np.corrcoef(rank_g, rank_w)[0, 1] > 0.85


def test_stem_formulation_variants_match():
    """The flag-gated stem/pool formulations (perf experiment knobs,
    infer_engine._STEM_IMPL/_POOL_IMPL) must match the default ops: the
    space-to-depth stem is the same taps re-packed (bf16 accumulation
    order may differ), the shifted-slice maxpool is bit-exact."""
    rng = np.random.default_rng(0)
    # rectangular cases = the dense frontend's border strips (a square-only
    # slice bug in _stem_s2d crashed the 299/32/20 sweep; round 4)
    for h, wd in ((299, 299), (292, 292), (150, 150), (32, 32),
                  (36, 292), (292, 36), (36, 36)):
        x = jnp.asarray(rng.normal(size=(2, h, wd, 3)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
        ref = infer_engine._conv_bias_relu(x, w, b, 2, ((3, 3), (3, 3)))
        got = infer_engine._stem_s2d(x, w, b)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=0.05, rtol=0.05,
        )
        pr = jax.lax.reduce_window(
            ref, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        ps = infer_engine._maxpool3s2_shift(ref)
        assert ps.shape == pr.shape
        assert float(jnp.abs(
            ps.astype(jnp.float32) - pr.astype(jnp.float32)
        ).max()) == 0.0


def test_step_factory_builds_engine(resnet50_small):
    """make_tile_infer_step(engine='q8') returns an engine-backed step whose
    probs track the flax step on a real batch (the top-k selection input)."""
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    model, variables = resnet50_small
    coords = tile_grid(64, 64, 32, 32)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.integers(0, 255, (6, 64, 64, 3), dtype=np.uint8))
    flip = jnp.zeros((6,), jnp.int32)

    fast = steps_mod.make_tile_infer_step(
        model, 32, coords, variables=variables, engine="q8",
        calib_images=np.asarray(images[:2]),
    )
    ref = steps_mod.make_tile_infer_step(model, 32, coords)
    p_fast = np.asarray(fast(variables, images, flip)).ravel()
    p_ref = np.asarray(ref(variables, images, flip)).ravel()
    order_fast = np.argsort(p_fast)
    order_ref = np.argsort(p_ref)
    k = max(2, len(p_fast) // 5)
    overlap = len(set(order_fast[-k:]) & set(order_ref[-k:])) / k
    assert overlap >= 0.75
