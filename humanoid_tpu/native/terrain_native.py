"""ctypes bindings for the C++ terrain synthesizer (terrain.cpp).

`build_terrain_native(cfg, seed)` is a drop-in replacement for
humanoid_tpu.env.terrain.build_terrain: same TerrainWorld output, same
curriculum layout (difficulty = row/rows, type = column), ~50x faster for
large worlds since the per-cell generators run in compiled code. Falls
back to the NumPy path when g++ is unavailable
(HUMANOID_TPU_NATIVE_TERRAIN=0 forces the fallback).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from ..config.structs import TerrainCfg
from ..env.terrain import TerrainWorld, build_terrain
from .build import load_library

_c_double_p = ctypes.POINTER(ctypes.c_double)
_c_int16_p = ctypes.POINTER(ctypes.c_int16)

# selected-terrain primitive ids (must match terrain.cpp selected_cell)
SELECTED_IDS = {
    "flat": 0, "rough": 1, "slope": 2, "stairs": 3, "discrete": 4,
    "stepping_stones": 5, "gap": 6, "pit": 7, "uneven": 8,
}


def _lib():
    if os.environ.get("HUMANOID_TPU_NATIVE_TERRAIN", "1") == "0":
        return None
    lib = load_library("terrain")
    if lib is not None and not getattr(lib, "_sigs_set", False):
        lib.ht_build_world.argtypes = [
            _c_double_p, _c_double_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, _c_double_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_double,
        ]
        lib.ht_pyramid_slope.argtypes = [
            _c_int16_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
        ]
        lib.ht_pyramid_stairs.argtypes = [
            _c_int16_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        lib.ht_gap.argtypes = [
            _c_int16_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
        ]
        lib.ht_pit.argtypes = [
            _c_int16_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double,
        ]
        lib._sigs_set = True
    return lib


def native_available() -> bool:
    return _lib() is not None


def pyramid_slope_native(n, hs, vs, slope, platform=1.0) -> np.ndarray:
    lib = _lib()
    h = np.zeros((n, n), dtype=np.int16)
    lib.ht_pyramid_slope(
        h.ctypes.data_as(_c_int16_p), n, hs, vs, slope, platform
    )
    return h


def pyramid_stairs_native(n, hs, vs, step_w, step_h, platform=1.0):
    lib = _lib()
    h = np.zeros((n, n), dtype=np.int16)
    lib.ht_pyramid_stairs(
        h.ctypes.data_as(_c_int16_p), n, hs, vs, step_w, step_h, platform
    )
    return h


def build_terrain_native(cfg: TerrainCfg, seed: int = 0) -> TerrainWorld:
    lib = _lib()
    if lib is None:
        return build_terrain(cfg, seed)
    size_px = int(cfg.terrain_length / cfg.horizontal_scale)
    border_px = int(cfg.border_size / cfg.horizontal_scale)
    H = cfg.num_rows * size_px + 2 * border_px
    W = cfg.num_cols * size_px + 2 * border_px
    field = np.zeros((H, W), dtype=np.float64)
    origins = np.zeros((cfg.num_rows, cfg.num_cols, 3), dtype=np.float64)
    props = np.asarray(cfg.terrain_proportions, dtype=np.float64)
    selected = -1
    if cfg.selected_type:
        selected = SELECTED_IDS[cfg.selected_type]
    lib.ht_build_world(
        field.ctypes.data_as(_c_double_p),
        origins.ctypes.data_as(_c_double_p),
        cfg.num_rows, cfg.num_cols, size_px, border_px,
        cfg.horizontal_scale, cfg.vertical_scale, cfg.terrain_length,
        props.ctypes.data_as(_c_double_p), len(props),
        1 if cfg.curriculum else 0,
        1 if cfg.generator_set == "base" else 0, selected, seed,
        cfg.uneven_amplitude,
    )
    return TerrainWorld(
        height=field,
        horizontal_scale=cfg.horizontal_scale,
        border=cfg.border_size,
        env_origins=origins,
        num_rows=cfg.num_rows,
        num_cols=cfg.num_cols,
        terrain_length=cfg.terrain_length,
    )
