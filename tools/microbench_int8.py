"""Microbench: single-dot Pallas int8 GEMMs at stage-2 trunk shapes.

Round-2's PERF.md left one lever unmeasured: per-conv *single* Pallas int8
GEMMs with XLA glue between them. Measuring it correctly exposed that every
round-2 microbench carried a ~30 ms per-call device->host fetch floor
through the axon tunnel (an empty fori_loop body "measures" 1.8 ms/iter at
16 iters). This tool therefore measures each shape with the empty-body
floor SUBTRACTED and enough iterations that real work dominates:

  A. raw GEMM TOPS per trunk conv/whole-tile-GEMM shape (requant epilogue);
  B. a full layer2-b2 bottleneck (1x1 -> whole-tile 3x3 GEMM -> 1x1 with
     the residual fused in the epilogue) — effective time including glue.

Measurement rules (docs/PERF.md "Measurement discipline"): all iterations
chained inside ONE jit via fori_loop + optimization_barrier (defeats CSE
without adding bandwidth), scalar-fetch sync, best-of-3, floor-subtracted.
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

from cellsegmentation_tpu.ops.q8_gemm import q8_matmul

# (name, M, K, N) — real shapes of the 43,200-tile bench step; whole-tile
# GEMM formulations for the tiny-spatial 3x3s (ops/q8_trunk.py)
SHAPES = [
    ("l2.b1.c1 1x1 256->128 @8x8", 2764800, 256, 128),
    ("l2.b1.c2 3x3s2 im2col K=1152", 691200, 1152, 128),
    ("l2.c2 whole-tile 3x3 K=2048", 43200, 2048, 2048),
    ("l2.c1 1x1 512->128", 691200, 512, 128),
    ("l2.c3 1x1 128->512", 691200, 128, 512),
    ("l3.b1.c2 whole-tile 3x3 K=4096", 43200, 4096, 1024),
    ("l3.c2 whole-tile 3x3 K=1024", 43200, 1024, 1024),
    ("l3.c1 1x1 1024->256", 172800, 1024, 256),
    ("l4.b1.c2 whole-tile 3x3 K=2048", 43200, 2048, 512),
    ("l4.c1 1x1 2048->512", 43200, 2048, 512),
    ("l4.c3 1x1 512->2048", 43200, 512, 2048),
]


def _timed_total(fn, *args, rounds: int = 3) -> float:
    float(fn(*args))  # compile + warm
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
    return _timed_total(_loop(lambda x2: x2[0, 0].astype(jnp.float32), iters), x)


def bench_raw(iters: int):
    print("== A. raw int8 GEMM (requant epilogue), floor-subtracted ==")
    rng = np.random.default_rng(0)
    for name, m, k, n in SHAPES:
        x = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        w = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
        b = jnp.zeros((n,), jnp.float32)
        ws = jnp.full((n,), 0.02, jnp.float32)

        def body(x2, w, b, ws):
            y = q8_matmul(x2, w, b, ws, out_kind="int8", in_scale=0.05,
                          out_scale=0.1)
            return y[0, 0].astype(jnp.float32)

        tot = _timed_total(_loop(body, iters), x, w, b, ws)
        sec = max(tot - _floor(x, iters), 1e-9) / iters
        tops = 2 * m * k * n / sec / 1e12
        print(f"  {name:32s} {sec * 1e3:7.4f} ms  {tops:6.1f} TOPS",
              flush=True)


def bench_block(iters: int):
    """layer2-b2 bottleneck: 1x1 512->128, whole-tile 3x3 GEMM 2048->2048,
    1x1 128->512 with residual fused in the epilogue; all int8 HBM forms."""
    print("== B. XLA-glued bottleneck (layer2-b2, residual fused) ==")
    n_t, hw, c_in, c_mid = 43200, 4, 512, 128
    m = n_t * hw * hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (m, c_in), dtype=np.int8))
    w1 = jnp.asarray(rng.integers(-127, 127, (c_in, c_mid), dtype=np.int8))
    w2 = jnp.asarray(rng.integers(-127, 127, (hw * hw * c_mid,) * 2,
                                  dtype=np.int8))
    w3 = jnp.asarray(rng.integers(-127, 127, (c_mid, c_in), dtype=np.int8))
    b1 = jnp.zeros((c_mid,), jnp.float32)
    b2 = jnp.zeros((hw * hw * c_mid,), jnp.float32)
    b3 = jnp.zeros((c_in,), jnp.float32)
    s1 = jnp.full((c_mid,), 0.02, jnp.float32)
    s2 = jnp.full((hw * hw * c_mid,), 0.02, jnp.float32)
    s3 = jnp.full((c_in,), 0.02, jnp.float32)

    def body(x2, w1, w2, w3, b1, b2, b3, s1, s2, s3):
        h1 = q8_matmul(x2, w1, b1, s1, out_kind="int8", in_scale=0.05,
                       out_scale=0.1)
        h2 = q8_matmul(h1.reshape(n_t, hw * hw * c_mid), w2, b2, s2,
                       out_kind="int8", in_scale=0.1, out_scale=0.1)
        h3 = q8_matmul(h2.reshape(m, c_mid), w3, b3, s3,
                       residual=x2, res_scale=0.05,
                       out_kind="int8", in_scale=0.1, out_scale=0.1)
        return h3[0, 0].astype(jnp.float32)

    args = (x, w1, w2, w3, b1, b2, b3, s1, s2, s3)
    tot = _timed_total(_loop(body, iters), *args)
    sec = max(tot - _floor(x, iters), 1e-9) / iters
    flops = 2 * m * (c_in * c_mid + hw * hw * c_mid * c_mid + c_mid * c_in)
    print(f"  block: {sec * 1e3:7.4f} ms  {flops / sec / 1e12:6.1f} "
          f"eff-TOPS (conv-equivalent flops)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=128)
    p.add_argument("--only", choices=("raw", "block"), default=None)
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"devices: {jax.devices()}")
    if args.only in (None, "raw"):
        bench_raw(args.iters)
    if args.only in (None, "block"):
        bench_block(args.iters)


if __name__ == "__main__":
    main()
