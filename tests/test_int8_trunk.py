"""int8 Pallas trunk: exact-integer oracle for the chain kernel (interpret
mode) + end-to-end fidelity vs the flax bf16 path.

The oracle implements the SAME quantized math as plain strided numpy convs
on the original [N,H,W,C] layout — independent of the kernel's parity-plane
space-to-depth formulation, so it checks that trick too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.core.dtypes import F32_POLICY
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.ops.int8_trunk import (
    QBlock,
    make_int8_tile_logits,
    quantized_chain,
    space_to_depth,
)


def _requant(acc_i32, combo, bias):
    y = acc_i32.astype(np.float32) * combo + bias
    return np.clip(np.round(y), 0, 127).astype(np.int64)


def _conv3x3_int(x, w, stride):
    """x [N,H,W,C] int64, w [9,C,Co] tap-major int64 -> int64 [N,Ho,Wo,Co]."""
    n, h, wd, c = x.shape
    ho, wo = h // stride, wd // stride
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((n, ho, wo, w.shape[-1]), np.int64)
    for di in range(3):
        for dj in range(3):
            win = xp[:, di : di + stride * ho : stride,
                     dj : dj + stride * wo : stride, :]
            out += win.reshape(-1, c).dot(w[di * 3 + dj]).reshape(out.shape)
    return out


def _oracle_chain(x_q, blocks, stride):
    """Plain-layout quantized chain (int exact, f32 epilogues)."""
    xv = x_q.astype(np.int64)
    for bi, blk in enumerate(blocks):
        s = stride if bi == 0 else 1
        n, h, w, cin = xv.shape
        flat = xv.reshape(-1, cin)
        h1 = _requant(flat.dot(np.asarray(blk.w1, np.int64)), blk.c1, blk.b1)
        h1 = h1.reshape(n, h, w, -1)
        h2 = _requant(
            _conv3x3_int(h1, np.asarray(blk.w2, np.int64), s), blk.c2, blk.b2
        )
        ho, wo = h2.shape[1], h2.shape[2]
        main = h2.reshape(-1, h2.shape[-1]).dot(
            np.asarray(blk.w3, np.int64)
        ).astype(np.float32) * blk.c3 + blk.b3
        if blk.wd is not None:
            xs = xv[:, ::s, ::s, :]
            res = xs.reshape(-1, cin).dot(
                np.asarray(blk.wd, np.int64)
            ).astype(np.float32) * blk.cd + blk.bd
        else:
            res = flat.astype(np.float32) * blk.res_scale
        y = np.clip(np.round(np.maximum(main + res, 0.0)), 0, 127)
        xv = y.astype(np.int64).reshape(n, ho, wo, -1)
    return xv.astype(np.int8)


def _rand_block(rng, cin, cm, cout, proj):
    def w(*shape):
        return jnp.asarray(rng.integers(-40, 40, shape, dtype=np.int64).astype(np.int8))

    def v(n, scale=1e-3):
        return (rng.uniform(0.5, 1.5, n) * scale).astype(np.float32)

    return QBlock(
        w1=w(cin, cm), w2=w(9, cm, cm), w3=w(cm, cout),
        wd=w(cin, cout) if proj else None,
        c1=v(cm), b1=v(cm, 1.0), c2=v(cm), b2=v(cm, 1.0),
        c3=v(cout), b3=v(cout, 1.0),
        cd=v(cout) if proj else None, bd=v(cout, 1.0) if proj else None,
        res_scale=0.7,
    )


class TestChainKernelVsOracle:
    @pytest.mark.parametrize(
        "stride,h,blocks_spec",
        [
            (1, 8, [(16, 8, 32, True), (32, 8, 32, False)]),
            (2, 8, [(16, 8, 32, True), (32, 8, 32, False)]),
            (2, 2, [(16, 8, 32, True), (32, 8, 32, False)]),  # 1x1 output
        ],
    )
    def test_matches_integer_oracle(self, rng, stride, h, blocks_spec):
        blocks = [_rand_block(rng, *spec) for spec in blocks_spec]
        n = 8
        x_q = rng.integers(0, 100, (n, h, h, blocks_spec[0][0])).astype(np.int8)
        expected = _oracle_chain(x_q, blocks, stride)

        xin = jnp.asarray(space_to_depth(jnp.asarray(x_q)) if stride == 2 else x_q)
        ho = h // stride
        got = np.asarray(
            quantized_chain(
                xin, blocks, stride=stride, h_out=ho, w_out=ho,
                chunk=4, interpret=True,
            )
        )
        assert got.shape == expected.shape
        # integer path is exact; the f32 epilogue may flip round-to-nearest
        # at exact .5 boundaries — allow a vanishing fraction of off-by-ones
        diff = np.abs(got.astype(np.int32) - expected.astype(np.int32))
        assert diff.max() <= 1
        assert (diff != 0).mean() < 1e-3


class TestEndToEndFidelity:
    def test_logit_margin_tracks_flax(self, rng):
        model = build_model("resnet50", policy=F32_POLICY)
        variables = init_variables(model, jax.random.PRNGKey(0))
        from cellsegmentation_tpu.data.batches import normalize_images

        tiles = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)
        x = normalize_images(jnp.asarray(tiles), jnp.zeros(64, jnp.int32))
        built = make_int8_tile_logits(model, variables, np.asarray(x[:32]))
        assert built is not None
        logits_fn, qt = built
        fast = np.asarray(logits_fn(variables["params"]["fc_tile"], x))
        ref = np.asarray(model.apply(variables, x, mode="tile", train=False))
        m_f = fast[:, 1] - fast[:, 0]
        m_r = ref[:, 1] - ref[:, 0]
        # ranking fidelity: the margin ordering drives stage-2 top-k selection
        assert np.corrcoef(m_f, m_r)[0, 1] > 0.85
        k = 16
        overlap = len(
            set(np.argsort(m_f)[-k:]) & set(np.argsort(m_r)[-k:])
        ) / k
        assert overlap >= 0.5

    def test_unfoldable_arch_returns_none(self):
        model = build_model("efficientnet_b0", policy=F32_POLICY)
        variables = init_variables(model, jax.random.PRNGKey(0))
        assert (
            make_int8_tile_logits(model, variables, np.zeros((4, 32, 32, 3), np.float32))
            is None
        )
