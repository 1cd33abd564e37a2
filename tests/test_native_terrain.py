"""Native C++ terrain synthesizer vs the NumPy reference implementation."""
import numpy as np
import pytest

from humanoid_tpu.config.structs import TerrainCfg
from humanoid_tpu.env.terrain import (
    SubTerrain,
    build_terrain,
    pyramid_sloped_terrain,
    pyramid_stairs_terrain,
)
from humanoid_tpu.native.terrain_native import (
    build_terrain_native,
    native_available,
    pyramid_slope_native,
    pyramid_stairs_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


@needs_native
def test_deterministic_primitives_bit_exact():
    n, hs, vs = 80, 0.1, 0.005
    for slope in (0.12, -0.09):
        ref = SubTerrain(n, hs, vs)
        pyramid_sloped_terrain(ref, slope, platform_size=0.1)
        assert np.array_equal(
            pyramid_slope_native(n, hs, vs, slope, 0.1),
            ref.height_field_raw,
        )
    for sh in (0.03, -0.02):
        ref = SubTerrain(n, hs, vs)
        pyramid_stairs_terrain(ref, 0.4, sh, platform_size=1.0)
        assert np.array_equal(
            pyramid_stairs_native(n, hs, vs, 0.4, sh, 1.0),
            ref.height_field_raw,
        )


@needs_native
def test_world_assembly_matches_python_layout():
    cfg = TerrainCfg(mesh_type="heightfield", num_rows=4, num_cols=7,
                     border_size=5.0)
    wn = build_terrain_native(cfg, seed=3)
    wp = build_terrain(cfg, seed=3)
    assert wn.height.shape == wp.height.shape
    # identical curriculum layout -> identical xy origins; z only differs on
    # RNG-dependent cells
    assert np.allclose(wn.env_origins[:, :, :2], wp.env_origins[:, :, :2])
    # deterministic columns (flat / slopes / stairs under the default
    # proportions) must be bit-identical
    size_px = int(cfg.terrain_length / cfg.horizontal_scale)
    bp = int(cfg.border_size / cfg.horizontal_scale)
    props = np.cumsum(cfg.terrain_proportions)
    for j in range(cfg.num_cols):
        choice = j / cfg.num_cols + 0.001
        deterministic = (
            choice < props[0]
            or (props[2] if len(props) > 2 else 1.0) <= choice
        )
        if not deterministic:
            continue
        sl = np.s_[bp : bp + 4 * size_px,
                   bp + j * size_px : bp + (j + 1) * size_px]
        assert np.array_equal(wn.height[sl], wp.height[sl]), f"col {j}"
    # random cells still bounded like the python ones
    assert wn.height.min() >= wp.height.min() - 0.1
    assert wn.height.max() <= wp.height.max() + 0.1


@needs_native
def test_uneven_amplitude_plumbed_to_native():
    """TerrainCfg.uneven_amplitude reaches the C++ synthesizer: an
    all-uneven world's height range scales with the amplitude (round-5
    terrain_track4 recipe: oracle intensity at mid difficulty)."""
    base = dict(mesh_type="heightfield", num_rows=4, num_cols=3,
                border_size=2.0,
                terrain_proportions=(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                                     1.0))
    w1 = build_terrain_native(TerrainCfg(**base, uneven_amplitude=0.2),
                              seed=3)
    w2 = build_terrain_native(TerrainCfg(**base, uneven_amplitude=0.35),
                              seed=3)
    r1 = float(w1.height.max() - w1.height.min())
    r2 = float(w2.height.max() - w2.height.min())
    assert r2 > 1.4 * r1, (r1, r2)
    # numpy path sees the same knob
    wp = __import__("humanoid_tpu.env.terrain", fromlist=["build_terrain"]
                    ).build_terrain(TerrainCfg(**base,
                                               uneven_amplitude=0.35),
                                    seed=3)
    rp = float(wp.height.max() - wp.height.min())
    assert rp > 1.4 * r1, (r1, rp)
