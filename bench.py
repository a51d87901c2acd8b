"""Stage-2 tile-inference throughput benchmark (the pipeline's hot loop).

Measures the reference's HOT LOOP #2 (SURVEY §3.2): dense per-tile forward of
every 32×32 tile of every 299×299 image through the MILresnet50 encoder +
tile head. On-device tile extraction (gather) + bf16 NHWC convs; reported as
299²-image-equivalents/sec (1 image = 225 tiles at tile_size 32 / interval
20), against the BASELINE.json target of 5,000 img-equiv tiles/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    TILE_SIZE, INTERVAL, HW = 32, 20, 299
    IMAGE_BATCH = 128  # 128 images/step × 225 tiles = 28800-tile forward

    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    coords = tile_grid(HW, HW, TILE_SIZE, INTERVAL)
    infer_fn = steps_mod.make_tile_infer_step(model, TILE_SIZE, coords)
    tiles_per_image = int(coords.shape[0])

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, 255, size=(IMAGE_BATCH, HW, HW, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    flip = jnp.zeros((IMAGE_BATCH,), jnp.int32)

    def run(n_steps: int) -> float:
        """Time n_steps; force execution with ONE scalar fetch (the axon
        tunnel's block_until_ready does not actually block, and fetching the
        full prob matrix would measure tunnel bandwidth, not compute)."""
        start = time.perf_counter()
        sums = []
        for i in range(n_steps):
            probs = infer_fn(variables, batches[i % len(batches)], flip)
            sums.append(jnp.sum(probs))
        float(jnp.stack(sums).sum())  # single 4-byte sync point
        return time.perf_counter() - start

    run(2)  # compile + warmup
    run(2)
    elapsed = min(run(10) for _ in range(3))
    images_per_sec = 10 * IMAGE_BATCH / elapsed
    baseline = 5000.0  # BASELINE.json: ≥5k 299² img-equiv tiles/s/chip
    print(
        json.dumps(
            {
                "metric": "stage2_tile_inference_throughput",
                "value": round(images_per_sec, 1),
                "unit": "299x299-image-equiv/s/chip (x225 32x32 tiles)",
                "vs_baseline": round(images_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
