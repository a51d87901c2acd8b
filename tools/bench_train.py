"""Training-loop throughput for all three pipeline stages (VERDICT r4 #5).

The serving bench (bench.py) covers HOT LOOP #2 (stage-2 dense tile
inference) only; this tool measures the training half at the reference's
own batch geometry:

  - stage 1: image fwd/bwd (α·CE + β·MSE, both heads) at batch 48
    (reference: train/train.py:51-105, train_image.py:45);
  - stage 2: selected-tile CE train step at tile batch 40,960 gathered
    from the device-resident image stack (reference: train/train.py:12-48,
    train_tile.py:32);
  - stage 3: seg decoder dice step at image batch 32, 299² masks
    (reference: train/train.py:172-207, train_seg.py:46).

Same measurement discipline as bench.py: persistent compile cache, warmup
dispatches, one scalar fetch per step as the tunnel sync (docs/PERF.md
"Measurement discipline"). Run alone on the chip:

    python tools/bench_train.py            # all stages
    STAGES="s2" S2_TILES=20480 python tools/bench_train.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.train import steps as steps_mod
from cellsegmentation_tpu.train.schedules import make_schedule
from cellsegmentation_tpu.train.state import create_train_state

ENCODER = os.environ.get("ENCODER", "resnet50")
STAGES = os.environ.get("STAGES", "s1 s2 s3").split()
STEPS = int(os.environ.get("STEPS", "8"))
# RESIDENT=1: pre-put the batches on device (cycled) so the number is the
# device step rate — the host->device tunnel upload (e.g. 12.9 MB/step of
# stage-1 images) is an artifact of the single-chip tunnel, not of the
# framework's input pipeline (which overlaps uploads with compute on pods)
RESIDENT = os.environ.get("RESIDENT", "") == "1"
# PIPELINED=1: time the host-fed loop under the trainers' 2-deep deferred
# metric fetch (trainers._MetricsPipe) instead of per-step fetch syncs
PIPELINED = os.environ.get("PIPELINED", "") == "1"
S1_BATCH = int(os.environ.get("S1_BATCH", "48"))
S2_TILES = int(os.environ.get("S2_TILES", "40960"))
S3_BATCH = int(os.environ.get("S3_BATCH", "32"))
HW, TS = 299, 32

model = build_model(ENCODER)
# host-resident master copy: each stage's train step donates its state, so
# stage N+1 must not alias arrays a stage-N step already consumed
variables = jax.device_get(init_variables(model, jax.random.PRNGKey(0)))
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(1)


def timed_loop(name, state, step_fn, make_args, unit_per_step):
    if RESIDENT:
        pool = [
            jax.tree_util.tree_map(
                lambda a: jax.device_put(a) if isinstance(a, np.ndarray) else a,
                make_args(),
            )
            for _ in range(4)
        ]
        make_args = lambda i=iter(range(10**9)): pool[next(i) % 4]  # noqa: E731
    # 2 warmup steps: compile + stats settle. donate_argnums donates the
    # state, so thread it through.
    for _ in range(2):
        state, metrics = step_fn(state, *make_args())
        _ = float(metrics["loss"])  # scalar fetch = the only reliable sync
    if PIPELINED:
        # replicates (by hand — the benchmark threads donated state
        # through a timed loop, which the epoch-scoped trainers helper
        # doesn't expose) the trainer loops' _MetricsPipe discipline:
        # batch i's scalar fetch is deferred until after batch i+1 is
        # dispatched, so the host-fed upload overlaps device compute.
        # Whole-loop timing (a per-step wall clock is meaningless once
        # steps overlap); host batches pre-generated so np RNG cost
        # doesn't pollute the rate.
        pool = [make_args() for _ in range(4)]
        pending = None
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = step_fn(state, *pool[i % 4])
            if pending is not None:
                _ = float(pending["loss"])
            pending = metrics
        _ = float(pending["loss"])
        med = (time.perf_counter() - t0) / STEPS
        print(
            f"{name}: {med * 1e3:.1f} ms/step amortized over {STEPS} "
            f"(2-deep pipelined loop) -> "
            f"{unit_per_step / med:,.1f} {name.split('(')[1].split()[0]}/s",
            flush=True,
        )
        return unit_per_step / med
    times = []
    for _ in range(STEPS):
        args = make_args()  # host RNG outside the timed region
        t0 = time.perf_counter()
        state, metrics = step_fn(state, *args)
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(
        f"{name}: {med * 1e3:.1f} ms/step median over {STEPS} "
        f"(min {min(times) * 1e3:.1f}, max {max(times) * 1e3:.1f}) -> "
        f"{unit_per_step / med:,.1f} {name.split('(')[1].split()[0]}/s",
        flush=True,
    )
    return unit_per_step / med


results = {}

if "s1" in STAGES:
    schedule = make_schedule("OneCycleLR", 1e-3, epochs=2, steps_per_epoch=8)
    state = create_train_state(
        variables["params"], variables["batch_stats"], "image", schedule
    )
    step_fn = steps_mod.make_image_train_step(model)

    def s1_args():
        return (
            {
                "images": rng.integers(
                    0, 255, size=(S1_BATCH, HW, HW, 3), dtype=np.uint8
                ),
                "flip": rng.integers(0, 4, S1_BATCH).astype(np.int32),
                "cls": rng.integers(0, 7, S1_BATCH),
                "reg": rng.integers(0, 30, S1_BATCH).astype(np.float32),
                "valid": np.ones(S1_BATCH, dtype=bool),
            },
            key,
        )

    results["s1"] = timed_loop(
        f"stage-1 fwd/bwd (img b={S1_BATCH} 299^2)",
        state, step_fn, s1_args, S1_BATCH,
    )

if "s2" in STAGES:
    # tiles are gathered on-device from a resident 48-image stack, the
    # framework's stage-2 data path (no host tile materialization)
    n_imgs = 48
    images_dev = jax.device_put(
        rng.integers(0, 255, size=(n_imgs, HW, HW, 3), dtype=np.uint8)
    )
    schedule = make_schedule("OneCycleLR", 5e-4, epochs=2, steps_per_epoch=8)
    state = create_train_state(
        variables["params"], variables["batch_stats"], "tile", schedule
    )
    tile_step = steps_mod.make_tile_train_step(model, TS)

    def s2_args():
        return (
            images_dev,
            {
                "img_idx": rng.integers(0, n_imgs, S2_TILES).astype(np.int32),
                "xs": rng.integers(0, HW - TS, S2_TILES).astype(np.int32),
                "ys": rng.integers(0, HW - TS, S2_TILES).astype(np.int32),
                "flip": rng.integers(0, 4, S2_TILES).astype(np.int32),
                "label": rng.integers(0, 2, S2_TILES).astype(np.int32),
                "valid": np.ones(S2_TILES, dtype=bool),
            },
        )

    results["s2"] = timed_loop(
        f"stage-2 tile CE fwd/bwd (tiles b={S2_TILES} {TS}^2)",
        state, tile_step, s2_args, S2_TILES,
    )

if "s3" in STAGES:
    schedule = make_schedule("OneCycleLR", 5e-5, epochs=2, steps_per_epoch=8)
    state = create_train_state(
        variables["params"], variables["batch_stats"], "segment", schedule
    )
    seg_step = steps_mod.make_seg_train_step(model)

    def s3_args():
        return (
            {
                "images": rng.integers(
                    0, 255, size=(S3_BATCH, HW, HW, 3), dtype=np.uint8
                ),
                "flip": rng.integers(0, 4, S3_BATCH).astype(np.int32),
                "mask": rng.integers(0, 2, size=(S3_BATCH, HW, HW)).astype(
                    np.int32
                ),
                "valid": np.ones(S3_BATCH, dtype=bool),
            },
            key,
        )

    results["s3"] = timed_loop(
        f"stage-3 seg dice fwd/bwd (img b={S3_BATCH} 299^2)",
        state, seg_step, s3_args, S3_BATCH,
    )

print("DONE", {k: round(v, 1) for k, v in results.items()})
