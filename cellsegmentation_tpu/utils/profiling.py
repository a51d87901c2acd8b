"""Profiling hooks (SURVEY §5.1: the reference has none; we add jax.profiler).

Usage in any trainer/CLI:

    from cellsegmentation_tpu.utils.profiling import trace
    with trace("./output/profile"):   # no-op when CST_PROFILE is unset
        ... jitted steps ...

Set ``CST_PROFILE=1`` (or pass force=True) to capture a TensorBoard-viewable
trace; ``annotate`` adds named spans inside a trace.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator


def profiling_enabled() -> bool:
    return os.environ.get("CST_PROFILE", "") not in ("", "0")


@contextlib.contextmanager
def trace(log_dir: str, force: bool = False) -> Iterator[None]:
    """jax.profiler trace over a code region (gated by CST_PROFILE)."""
    if not (force or profiling_enabled()):
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span that shows up inside a profiler trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
