"""Lazy g++ build + ctypes load for the native components."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = {}


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile <name>.cpp to <name>.so (once, cached on disk) and dlopen it.
    Returns None if no compiler is available or the build fails — callers
    fall back to their NumPy implementations."""
    if name in _CACHE:
        return _CACHE[name]
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"{name}.so")
    lib = None
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", so],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(so)
    except Exception:
        lib = None
    _CACHE[name] = lib
    return lib
