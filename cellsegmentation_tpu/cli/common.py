"""Shared CLI plumbing: flag-compatible argparse helpers, model/ckpt setup."""

from __future__ import annotations

import argparse
import os

import jax

# CST_PLATFORM overrides the JAX backend (the env-pinned axon plugin ignores
# JAX_PLATFORMS, so subprocess tests use this to force CPU).
if os.environ.get("CST_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["CST_PLATFORM"])

# Multi-host bootstrap (env-gated, must precede any backend touch): on a
# multi-host pod slice every stage CLI becomes one controller of the SPMD
# job, replacing the reference's dead NCCL path (train_image.py:444-455).
from cellsegmentation_tpu.parallel.multihost import maybe_initialize

maybe_initialize()

# Persistent compilation cache: repeat CLI invocations (the 3-stage pipeline
# is 3+ processes) replay XLA compiles from disk instead of re-paying them.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("CST_COMPILE_CACHE", os.path.expanduser("~/.cache/cst_xla")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cellsegmentation_tpu.core.config import load_data_path
from cellsegmentation_tpu.core.dtypes import DEFAULT_POLICY, F32_POLICY
from cellsegmentation_tpu.models import build_model, init_variables
from cellsegmentation_tpu.parallel.mesh import make_mesh
from cellsegmentation_tpu.train import checkpoint as ckpt_mod


def add_common_args(parser: argparse.ArgumentParser, default_epochs: int, default_batch: int, default_lr: float):
    parser.add_argument("-e", "--epochs", type=int, default=default_epochs)
    parser.add_argument("-B", "--batch_size", type=int, default=default_batch)
    parser.add_argument("-l", "--lr", type=float, default=default_lr)
    parser.add_argument("-s", "--scheduler", type=str, default=None,
                        choices=[None, "OneCycleLR", "ExponentialLR", "CosineAnnealingWarmRestarts"])
    parser.add_argument("-w", "--workers", type=int, default=4,
                        help="kept for reference-CLI parity; the device pipeline needs no loader workers")
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--test_every", type=int, default=1)
    parser.add_argument("-d", "--device", type=int, default=0,
                        help="kept for parity; device selection is owned by the JAX mesh")
    parser.add_argument("--distributed", action="store_true",
                        help="kept for parity; data parallelism is always on via the mesh")
    parser.add_argument("-o", "--output", type=str, default="./output")
    parser.add_argument("--debug", action="store_true", help="use only 100 images")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--data_path", type=str, default=None,
                        help="override [data] data_path from config.ini")
    parser.add_argument("--f32", action="store_true", help="disable bf16 compute")


def resolve_data_path(args) -> str:
    return args.data_path or load_data_path()


def policy_of(args):
    return F32_POLICY if args.f32 else DEFAULT_POLICY


def setup_model(encoder: str, args, rng_seed: int = 0):
    model = build_model(encoder, policy=policy_of(args))
    variables = init_variables(model, jax.random.PRNGKey(rng_seed))
    return model, variables


def load_stage_checkpoint(path: str, args, partitions=None):
    """Load a checkpoint, build its encoder's model, restore filtered subtrees."""
    ckpt = ckpt_mod.load_checkpoint(path)
    model, variables = setup_model(ckpt["encoder"], args)
    params, stats = ckpt_mod.restore_into(
        variables["params"], variables["batch_stats"], ckpt, partitions
    )
    return model, {"params": params, "batch_stats": stats}, ckpt


def default_mesh():
    return make_mesh()
