"""int8 quantization numerics (round-2 groundwork)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cellsegmentation_tpu.ops import quant


class TestWeightQuant:
    def test_roundtrip_error_bounded(self, rng):
        w = rng.normal(size=(64, 32)).astype(np.float32)
        w_q, scale = quant.quantize_weights(w)
        w_hat = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
        # max-abs symmetric quant: error is at most one quantization step
        # (exact-half roundings sit right at scale/2, so don't ride the edge)
        err = np.abs(w_hat - w)
        s = np.broadcast_to(np.asarray(scale)[None, :], err.shape)
        np.testing.assert_array_less(err, s * 0.75)
        assert (err / s).mean() < 0.3  # average error ~ scale/4

    def test_per_channel_scales(self, rng):
        w = rng.normal(size=(16, 4)).astype(np.float32)
        w[:, 2] *= 100  # one hot channel must not wreck the others
        w_q, scale = quant.quantize_weights(w)
        assert scale[2] > 50 * scale[0]
        w_hat = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
        rel = np.abs(w_hat - w).max(0) / np.abs(w).max(0)
        assert rel.max() < 0.01

    def test_zero_channel_safe(self):
        w = np.zeros((8, 2), np.float32)
        w_q, scale = quant.quantize_weights(w)
        assert np.all(np.asarray(w_q) == 0)
        assert np.all(np.asarray(scale) == 1.0)


class TestQuantizedGEMM:
    def test_matches_f32_within_tolerance(self, rng):
        x = rng.normal(size=(128, 64)).astype(np.float32)
        w = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
        b = rng.normal(size=32).astype(np.float32)
        want = x @ w + b

        x_scale = quant.calibrate_activation_scale(x)
        got = np.asarray(
            quant.quantized_dense_forward(jnp.asarray(x), w, jnp.asarray(b), x_scale)
        )
        rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
        assert rel.mean() < 0.02

    def test_ranking_fidelity(self, rng):
        """The stage-2 target: int8 must preserve top-k ordering of scores."""
        x = rng.normal(size=(256, 128)).astype(np.float32)
        w = rng.normal(size=(128, 1)).astype(np.float32)
        want = (x @ w)[:, 0]
        x_scale = quant.calibrate_activation_scale(x)
        got = np.asarray(
            quant.quantized_dense_forward(jnp.asarray(x), w, None, x_scale)
        )[:, 0]
        k = 25
        top_f32 = set(np.argsort(want)[-k:].tolist())
        top_i8 = set(np.argsort(got)[-k:].tolist())
        # overlap of top-10% selections stays near-perfect
        assert len(top_f32 & top_i8) >= k - 2
