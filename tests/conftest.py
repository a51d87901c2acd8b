"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform/device-count env vars before jax is imported anywhere
(SURVEY §4: multi-device tests via xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # mute XLA AOT-cache chatter
os.environ["CST_DISABLE_TB"] = "1"  # torch TB writer thread aborts long sessions
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

# NB: the persistent compilation cache is deliberately NOT enabled for the
# CPU test suite. XLA:CPU's AOT cache loader on this host logs machine-
# feature mismatches ("+prefer-no-scatter ... could lead to execution errors
# such as SIGILL") and long pytest sessions intermittently die with SIGABRT
# while fetching results of cache-loaded executables. Fresh compiles are
# slower but deterministic. (TPU CLI runs keep their cache — the axon remote
# compiler has been reliable.)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
