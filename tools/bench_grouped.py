"""Microbench: grouped-3x3 formulations at ResNeXt-101 trunk geometry.

resnext101_32x8d serves per-tile conv-land only (the GEMM trunk is
ungrouped-Bottleneck, ops/infer_engine.py) and measures parity with flax
(730 vs 731 img/s, docs/PERF.md). The grouped 3x3s run on tiny maps where
a conv wastes most taps on padding: at layer3's 2x2 px, 5 of 9 taps read
zeros. Candidate TPU formulations measured here at the real 43,200-tile
step shapes (VERDICT r4 #4):

  A. XLA grouped bf16 conv (the current conv-land primitive);
  B. XLA batched bf16 dot_general over groups, whole-tile Toeplitz form
     [g, M, px_in*cg] x [g, px_in*cg, px_out*cg];
  C. same batched dot in int8 (int32 accum, requant epilogue);
  D. the [M, px, g, cg] -> [g, M, px*cg] relayout each batched form needs
     from the GEMM trunk's px-major whole-tile rows (measured separately —
     it's per grouped conv, twice);
  E. C and D composed (transpose -> int8 batched dot -> transpose back).

MXU-quantum context: per-group channel width caps lane fill at cg/128
(32/128 at layer3) for ANY formulation that does not pad or pack groups —
the question is whether a batched dot at that fill still beats XLA's
padded-tap conv. Floor-subtracted timing (see tools/microbench_int8.py).

Run: python tools/bench_grouped.py [--iters 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_T = 43200  # tiles/step at the G=192 bench basis

# (name, spatial, C, groups) — resnext101_32x8d stages at the 32-px tile
GEOS = [
    ("l2 4x4 C=512 g=32 (cg=16)", 4, 512, 32),
    ("l3 2x2 C=1024 g=32 (cg=32)", 2, 1024, 32),
    ("l4 1x1 C=2048 g=32 (cg=64)", 1, 2048, 32),
]


def _timed_total(fn, *args, rounds: int = 3) -> float:
    float(fn(*args))
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _loop(body_fn, iters):
    @jax.jit
    def loop(*args):
        def body(_, carry):
            x2, s = carry
            (x2, s) = jax.lax.optimization_barrier((x2, s))
            return x2, s + body_fn(x2, *args[1:])

        _, s = jax.lax.fori_loop(0, iters, body, (args[0], jnp.float32(0)))
        return s

    return loop


def _floor(x, iters) -> float:
    return _timed_total(_loop(lambda x2: x2.ravel()[0].astype(jnp.float32), iters), x)


def _run(name, body, args, iters, useful_macs, raw_macs=None):
    tot = _timed_total(_loop(body, iters), *args)
    sec = max(tot - _floor(args[0], iters), 1e-9) / iters
    eff = 2 * useful_macs / sec / 1e12
    raw = f" raw {2 * raw_macs / sec / 1e12:6.1f}" if raw_macs else ""
    print(f"  {name:44s} {sec * 1e3:8.4f} ms  eff {eff:6.1f} TOPS{raw}",
          flush=True)
    return sec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=64)
    args_ns = p.parse_args()
    iters = args_ns.iters
    rng = np.random.default_rng(0)

    for name, hw, c, g in GEOS:
        cg = c // g
        px = hw * hw
        pxo = px  # stride-1 non-entry blocks dominate (22 of 23 at l3)
        # useful MACs of the grouped conv: out px * C_out * (taps_in * cg),
        # taps_in = in-bounds taps only (what a smart formulation must pay)
        k3 = min(3, hw + 1)  # valid taps per axis at this map size
        useful = N_T * px * c * (k3 * k3 * cg)
        print(f"== {name}: useful {2 * useful / 1e9:.1f} GFLOP/step ==")

        # A. XLA grouped bf16 conv at the real activation shape
        x4 = jnp.asarray(
            rng.normal(0, 1, (N_T, hw, hw, c)).astype(jnp.bfloat16)
        )
        k = jnp.asarray(rng.normal(0, 0.05, (3, 3, cg, c)).astype(jnp.bfloat16))

        def conv_body(x2, k):
            y = jax.lax.conv_general_dilated(
                x2, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
                preferred_element_type=jnp.bfloat16,
            )
            return y.ravel()[0].astype(jnp.float32)

        _run("A. XLA grouped bf16 conv", conv_body, (x4, k), iters,
             useful, raw_macs=N_T * px * c * 9 * cg)

        # whole-tile Toeplitz per group: [g, M, px*cg] x [g, px*cg, pxo*cg]
        kk, nn = px * cg, pxo * cg
        xg = jnp.asarray(
            rng.integers(-127, 127, (g, N_T, kk), dtype=np.int8)
        )
        wg8 = jnp.asarray(rng.integers(-127, 127, (g, kk, nn), dtype=np.int8))
        wgb = (wg8.astype(jnp.bfloat16) * jnp.bfloat16(0.05))
        toeplitz_macs = g * N_T * kk * nn

        def bf16_dot(x2, wgb):
            y = jax.lax.dot_general(
                x2.astype(jnp.bfloat16), wgb,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.bfloat16,
            )
            return y.ravel()[0].astype(jnp.float32)

        _run("B. batched bf16 dot (wholetile Toeplitz)", bf16_dot,
             (xg, wgb), iters, useful, raw_macs=toeplitz_macs)

        def int8_dot(x2, wg8):
            acc = jax.lax.dot_general(
                x2, wg8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            y = jnp.clip(
                jnp.round(acc.astype(jnp.float32) * 0.01), -127, 127
            ).astype(jnp.int8)
            return y.ravel()[0].astype(jnp.float32)

        _run("C. batched int8 dot + requant", int8_dot, (xg, wg8), iters,
             useful, raw_macs=toeplitz_macs)

        # D. the px-major -> group-major relayout (and back) the batched
        # forms need from the GEMM trunk's [M, px*C] rows
        xflat = jnp.asarray(
            rng.integers(-127, 127, (N_T, px * c), dtype=np.int8)
        )

        def relayout(x2):
            y = x2.reshape(N_T, px, g, cg).transpose(2, 0, 1, 3)
            y = y.reshape(g, N_T, kk)
            return y.ravel()[0].astype(jnp.float32)

        _run("D. relayout [M,px*C]->[g,M,px*cg] (int8)", relayout,
             (xflat,), iters, useful)

        def composed(x2, wg8):
            y = x2.reshape(N_T, px, g, cg).transpose(2, 0, 1, 3)
            y = y.reshape(g, N_T, kk)
            acc = jax.lax.dot_general(
                y, wg8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            yq = jnp.clip(
                jnp.round(acc.astype(jnp.float32) * 0.01), -127, 127
            ).astype(jnp.int8)
            back = yq.reshape(g, N_T, pxo, cg).transpose(1, 2, 0, 3)
            return back.ravel()[0].astype(jnp.float32)

        _run("E. relayout + int8 dot + relayout back", composed,
             (xflat, wg8), iters, useful, raw_macs=toeplitz_macs)

        # F. the grouped conv as the UNGROUPED production kernels on a
        # block-diagonal-expanded kernel (grouped K[dy,dx,cg,C] -> dense
        # K'[dy,dx,C,C] with zeros off the group diagonal): zero new code
        # in the trunk, g x redundant MACs, but runs at the dense int8
        # rate in the existing whole-tile layout — no relayout at all.
        from cellsegmentation_tpu.ops.q8_gemm import q8_conv3_tap, q8_matmul

        bias = jnp.zeros((pxo * c,), jnp.float32)
        wsc = jnp.full((pxo * c,), 0.01, jnp.float32)
        if px <= 9:
            # whole-tile Toeplitz GEMM [M, px*C] x [px*C, pxo*C] (the
            # wholetile impl the ungrouped trunk uses at <=9 px); the
            # block-diag zeros make it (px_in*g/k3^2) x raw-redundant
            wbig = jnp.asarray(
                rng.integers(-127, 127, (px * c, pxo * c), dtype=np.int8)
            )

            def f_body(x2, wbig, bias, wsc):
                y = q8_matmul(x2, wbig, bias, wsc, out_kind="int8",
                              in_scale=0.05, out_scale=0.05)
                return y.ravel()[0].astype(jnp.float32)

            _run("F. block-diag dense wholetile q8_matmul", f_body,
                 (xflat, wbig, bias, wsc), iters, useful,
                 raw_macs=N_T * px * c * pxo * c)
        else:
            # tap-accumulating conv (the ungrouped impl at >9 px):
            # [9*C, C] tap-major kernel, block-diag per tap
            wtap = jnp.asarray(
                rng.integers(-127, 127, (9 * c, c), dtype=np.int8)
            )
            bias_t = jnp.zeros((c,), jnp.float32)
            wsc_t = jnp.full((c,), 0.01, jnp.float32)

            def f_body(x2, wtap, bias_t, wsc_t):
                y = q8_conv3_tap(x2, wtap, bias_t, wsc_t, h_in=hw, w_in=hw,
                                 stride=1, c_in=c, in_scale=0.05,
                                 out_scale=0.05)
                return y.ravel()[0].astype(jnp.float32)

            _run("F. block-diag tap q8_conv3_tap", f_body,
                 (xflat, wtap, bias_t, wsc_t), iters, useful,
                 raw_macs=N_T * px * c * 9 * c)

    print("DONE")


if __name__ == "__main__":
    main()
