"""Pallas heightfield sampler (ops/terrain_kernel.py): parity against the
XLA gather path on CPU via pallas interpret mode. The real-TPU timing and
trajectory parity live in tests/test_physics_kernel.py (@needs_tpu) and
scripts_dev/profile_terrain.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.config.structs import TerrainCfg
from humanoid_tpu.env.terrain import build_terrain
from humanoid_tpu.ops.terrain_kernel import (
    SX,
    SY,
    TR,
    TC,
    TerrainSampler,
    build_tiles,
    tile_coords,
)
from humanoid_tpu.physics.contact import Terrain

N = 32


@pytest.fixture(scope="module")
def world():
    cfg = TerrainCfg(
        mesh_type="heightfield", measure_heights=True, num_rows=3,
        num_cols=4, border_size=5.0,
    )
    return build_terrain(cfg, seed=7)


@pytest.fixture(scope="module")
def terr(world):
    return Terrain(
        height=jnp.asarray(world.height, dtype=jnp.float32),
        horizontal_scale=world.horizontal_scale, border=world.border,
        flat=False,
    )


@pytest.fixture(scope="module")
def sampler(world):
    return TerrainSampler(
        world.height, 0.005, world.horizontal_scale, world.border, N,
        E=8, interpret=True,
    )


def _points(world, key, P, spread):
    Hm = (world.height.shape[0]) * world.horizontal_scale - world.border
    k1, k2 = jax.random.split(key)
    base = jax.random.uniform(k1, (N, 2), minval=2.0,
                              maxval=min(20.0, Hm - 2.0))
    pts = base[:, None, :] + jax.random.uniform(
        k2, (N, P, 2), minval=-spread, maxval=spread
    )
    return base, pts


def test_tile_geometry_covers_window(world, sampler):
    """Any point within 13 cells of the base lands inside the chosen
    tile."""
    tt = sampler.tt
    key = jax.random.PRNGKey(0)
    base, pts = _points(world, key, 64, 1.3)
    tid, ox, oy = tile_coords(tt, base)
    fx = (pts[..., 0] + tt.border) / tt.hs
    fy = (pts[..., 1] + tt.border) / tt.hs
    rx = np.asarray(fx - ox[:, None])
    ry = np.asarray(fy - oy[:, None])
    assert rx.min() >= 0 and rx.max() <= TR - 1
    assert ry.min() >= 0 and ry.max() <= TC - 1


def test_min3_table_matches_reference_probe(world):
    tt = build_tiles(world.height, 0.005, world.horizontal_scale,
                     world.border)
    H = np.asarray(world.height)
    t0 = np.asarray(tt.tiles[0])          # (2, TC, TR), tile at (0, 0)
    for i, j in [(0, 0), (5, 17), (40, 100), (TR - 2, TC - 2)]:
        exact = min(H[i, j], H[i + 1, j], H[i, j + 1])
        assert abs(t0[1, j, i] * tt.vs - exact) < 1e-5


def test_scan_min3_matches_gather_path(world, terr, sampler):
    base, scan = _points(world, jax.random.PRNGKey(1), 187, 0.95)
    _, con = _points(world, jax.random.PRNGKey(2), 9, 0.6)
    scan_h, _ = sampler.sample(base, scan, con)
    ref = terr.sample_min3(scan)
    # bf16 lookup of int16 counts: exact below 256 counts, <=2 counts
    # (1 cm) on the tallest terrain features
    assert float(jnp.max(jnp.abs(scan_h - ref))) < 0.011


def test_contact_corners_match_gather_path(world, terr, sampler):
    base, con = _points(world, jax.random.PRNGKey(3), 9, 0.6)
    _, scan = _points(world, jax.random.PRNGKey(4), 187, 0.95)
    _, corners = sampler.sample(base, scan, con)
    h, gx, gy = terr.interp_from_corners(*corners)
    rh, rgx, rgy = terr.sample_with_grad(con)
    assert float(jnp.max(jnp.abs(h - rh))) < 1e-5
    assert float(jnp.max(jnp.abs(gx - rgx))) < 1e-4
    assert float(jnp.max(jnp.abs(gy - rgy))) < 1e-4


def test_wall_mode_planes_match(world, sampler):
    """Trimesh-mode (vertical-face) interpolation from kernel corners
    matches the gather path — the warp math is shared downstream of the
    corner fetch."""
    cfg = TerrainCfg()
    wall = Terrain(
        height=jnp.asarray(world.height, dtype=jnp.float32),
        horizontal_scale=world.horizontal_scale, border=world.border,
        flat=False,
        wall_thresh=cfg.slope_treshold * world.horizontal_scale,
    )
    base, con = _points(world, jax.random.PRNGKey(5), 9, 0.6)
    _, scan = _points(world, jax.random.PRNGKey(6), 187, 0.95)
    _, corners = sampler.sample(base, scan, con)
    h, gx, gy = wall.interp_from_corners(*corners)
    rh, rgx, rgy = wall.sample_with_grad(con)
    assert float(jnp.max(jnp.abs(h - rh))) < 1e-5
    assert float(jnp.max(jnp.abs(gx - rgx))) < 1e-3
