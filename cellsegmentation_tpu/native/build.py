"""Build & load the native morphology extension (ctypes).

Compiled once per machine into ``~/.cache/cst_native`` (override with
CST_NATIVE_CACHE); reused across processes. Returns None when no compiler is
available — callers fall back to the SciPy implementation.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "morphology.cpp")
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _cache_dir() -> str:
    d = os.environ.get(
        "CST_NATIVE_CACHE", os.path.expanduser("~/.cache/cst_native")
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build(so_path: str) -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", so_path, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native() -> Optional[ctypes.CDLL]:
    """Compile-on-demand load; None if the toolchain is unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_cache_dir(), f"morphology_{digest}.so")
        if not os.path.exists(so_path):
            _build(so_path)
        lib = ctypes.CDLL(so_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.remove_small_objects.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int
        ]
        lib.remove_small_holes.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int
        ]
        lib.remove_small_regions_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
