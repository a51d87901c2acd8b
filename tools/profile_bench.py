"""Capture + summarize a device op profile of the stage-2 bench step.

Usage:  python tools/profile_bench.py [out_dir]

Runs the bench's tile-inference step under jax.profiler and prints the
per-op time table (parsing the xplane protobuf directly — the tensorboard
profile plugin's converter is broken against this environment's TF/protobuf
mix). This is the workflow that produced the perf-pass breakdowns.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(out_dir: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from cellsegmentation_tpu.models import build_model, init_variables
    from cellsegmentation_tpu.ops.tiles import tile_grid
    from cellsegmentation_tpu.train import steps as steps_mod

    # geometry overrides: CST_PROFILE_TS/IV/G profile other sweeps (e.g.
    # the stage-3 16/5 pseudo-mask grid: TS=16 IV=5 G=64)
    ts = int(os.environ.get("CST_PROFILE_TS", "32"))
    iv = int(os.environ.get("CST_PROFILE_IV", "20"))
    g = int(os.environ.get("CST_PROFILE_G", "192"))
    coords = tile_grid(299, 299, ts, iv)
    model = build_model("resnet50")
    variables = init_variables(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.integers(0, 255, size=(g, 299, 299, 3), dtype=np.uint8))
    flip = np.zeros((g,), np.int32)  # host: hits the flip-free dense graph
    engine = os.environ.get("CST_PROFILE_ENGINE", "q8")  # q8|q8g|q8d|q8dg|flax
    kwargs = (
        dict(variables=variables, engine=engine, calib_images=np.asarray(b[:4]))
        if engine in ("q8", "q8g", "q8d", "q8dg", "auto")
        else {}
    )
    infer = steps_mod.make_tile_infer_step(model, ts, coords, **kwargs)
    float(jnp.sum(infer(variables, b, flip)))  # compile + warm
    jax.profiler.start_trace(out_dir)
    sums = [jnp.sum(infer(variables, b, flip)) for _ in range(4)]
    float(jnp.stack(sums).sum())
    jax.profiler.stop_trace()


def summarize(out_dir: str, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                if name.startswith(("%copy-start", "%copy-done")):
                    continue  # async spans overlap real work
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
            rows = sorted(agg.items(), key=lambda kv: -kv[1])
            for name, ms in rows[:top]:
                print(f"  {ms / 4:7.3f} ms x{cnt[name]:3d}  {name[:90]}")
            print(f"TOTAL {sum(agg.values()) / 4:.1f} ms/step")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cst_profile"
    capture(out)
    summarize(out)
