"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform/device-count env vars before jax is imported anywhere
(SURVEY §4: multi-device tests via xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # mute XLA AOT-cache chatter
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The host environment pins JAX_PLATFORMS=axon (TPU tunnel) and that plugin
# ignores the env override — force the CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the first run pays XLA compiles, repeat runs
# of the suite replay them from disk (critical on this 1-core CPU host).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
