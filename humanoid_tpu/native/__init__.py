"""Native (C++) runtime components, loaded via ctypes.

Each module compiles its shared library lazily with g++ on first use and
caches the .so next to the source; every native path has a pure-Python
fallback so the package works without a toolchain.
"""
from .build import load_library  # noqa: F401
