"""Real multi-process SPMD: 2 CPU controllers bootstrap via
jax.distributed.initialize, assemble a global dp batch across processes,
and run a disjoint (round-robin) sweep whose merged result equals the
single-process ground truth.

This is the live replacement for the reference's dead NCCL/
DistributedSampler path (reference: train_image.py:432-455): the env-gated
bootstrap in parallel/multihost.py is exactly what a multi-host pod slice
uses, exercised here with 2 subprocesses x 2 virtual CPU devices.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np

from cellsegmentation_tpu.parallel.multihost import maybe_initialize

maybe_initialize()

import jax
import jax.numpy as jnp

pc = int(os.environ["CST_NUM_PROCESSES"])
assert jax.process_count() == pc, jax.process_count()
assert len(jax.devices()) == 2 * pc, jax.devices()

from cellsegmentation_tpu.parallel.mesh import make_mesh
from cellsegmentation_tpu.parallel.sharding import shard_batch
from cellsegmentation_tpu import infer

mesh = make_mesh(data=2 * pc, model=1)

# (a) global dp batch assembled from process-local rows
pi = jax.process_index()
local_rows = np.arange(8, dtype=np.float32).reshape(2, 4) + 10 * pi
batch = shard_batch(mesh, {"x": local_rows})
assert batch["x"].shape == (2 * pc, 4), batch["x"].shape  # global
total = float(jax.jit(jnp.sum)(batch["x"]))
# each host's 2 rows sum to 28 + 8*10*pi
want_total = sum(28 + 80 * p for p in range(pc))
assert abs(total - want_total) < 1e-6, total

# (b) disjoint round-robin sweep through infer.inference_tiles
class Src:
    image_hw = (36, 36)
    images = (
        np.arange(7 * 36 * 36 * 3, dtype=np.int64) % 251
    ).astype(np.uint8).reshape(7, 36, 36, 3)

    def __len__(self):
        return 7

calls = []

def stub_step(variables, images, flip):
    imgs = np.asarray(images, np.float64)
    calls.append(imgs.shape[0])
    # deterministic per-image "tile probs" [G, 9]
    base = imgs.mean(axis=(1, 2, 3))
    return base[:, None] + np.arange(9)[None, :]

probs = infer.inference_tiles(Src(), stub_step, None, 16, 10, image_batch=2)

# ground truth computed locally without any sharding
want = (
    Src.images.astype(np.float64).mean(axis=(1, 2, 3))[:, None]
    + np.arange(9)[None, :]
).astype(np.float32)
np.testing.assert_allclose(probs, want, rtol=1e-5)

# each process must have computed only its share of the 4 batches
# (pc=2: 2+2; pc=3: 2+1+1 — uneven shares + uneven merged row counts,
# exercising merge_process_rows' allgather padding)
n_batches = len(calls)
assert 0 < n_batches < 4, n_batches

with open(sys.argv[1], "w") as f:
    json.dump({"pi": pi, "batches": n_batches}, f)
print("WORKER_OK", pi)
"""


@pytest.mark.parametrize("pc", [2, 3])
def test_multiprocess_bootstrap_and_disjoint_sweep(tmp_path, pc):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    outs = []
    for pid in range(pc):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        env = dict(
            os.environ,
            CST_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            CST_COORDINATOR_ADDRESS=f"localhost:{port}",
            CST_NUM_PROCESSES=str(pc),
            CST_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), str(out)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    results = [json.load(open(o)) for o in outs]
    # the 4 sweep batches were split between the processes
    assert sum(r["batches"] for r in results) == 4
    assert {r["pi"] for r in results} == set(range(pc))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
