"""Terrain fidelity (VERDICT r1 missing #1/#2): all 7 generators are
selectable, the base-Terrain curriculum set matches the reference's
selection logic (reference terrain.py:110-143), the C++ assembly agrees
with the NumPy one on the new modes, and trimesh-mode vertical faces
(reference terrain.py:69-73 slope_treshold semantics) actually behave as
walls — both at the sampling level and through the contact model.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.assets import XBOT_JOINT_ORDER, XBOT_URDF
from humanoid_tpu.config.structs import TerrainCfg
from humanoid_tpu.env.terrain import (
    SubTerrain,
    base_make_terrain,
    build_terrain,
    selected_make_terrain,
)
from humanoid_tpu.native.terrain_native import (
    build_terrain_native,
    native_available,
)
from humanoid_tpu.physics import load_urdf
from humanoid_tpu.physics.contact import (
    ContactParams,
    Terrain,
    _point_forces,
)
from humanoid_tpu.physics.engine import (
    PhysState,
    control_step,
    default_phys_params,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)

ALL_SELECTED = ("flat", "rough", "slope", "stairs", "discrete",
                "stepping_stones", "gap", "pit")


def _cell(name, difficulty=0.8, size_px=80, seed=0):
    cfg = TerrainCfg()
    rng = np.random.RandomState(seed)
    return selected_make_terrain(cfg, name, difficulty, size_px, rng)


# ---------------------------------------------------------------------------
# generator coverage: every primitive is reachable and looks right
# ---------------------------------------------------------------------------

def test_selected_generators_signatures():
    vs = TerrainCfg().vertical_scale
    h = {n: _cell(n).height_field_raw.astype(np.float64) * vs
         for n in ALL_SELECTED}
    assert not h["flat"].any()
    # rough: bounded noise, both signs
    assert 0 < h["rough"].max() <= 0.10 and -0.10 <= h["rough"].min() < 0
    # slope: pyramid rising to ~0.4*d*(n/2)*hs, clamped at the 3 m
    # platform rim ((center-15px)/center * 1.28 ~= 0.79)
    assert h["slope"].min() == 0 and 0.6 < h["slope"].max() < 1.3
    # stairs: discrete levels one step height apart (to within the int16
    # vertical_scale quantization)
    lv = np.unique(h["stairs"])
    step = 0.05 + 0.18 * 0.8
    assert len(lv) > 3
    assert np.allclose(np.diff(lv), step, atol=2 * vs)
    # discrete: rectangles at +-h and +-h/2 with a flat platform
    dh = 0.05 + 0.2 * 0.8
    assert set(np.round(np.unique(h["discrete"]) / (dh / 2)).astype(int)) <= {
        -2, -1, 0, 1, 2
    }
    # stepping stones: deep floor with stones at 0
    assert h["stepping_stones"].min() <= -9.9
    assert (h["stepping_stones"] == 0).sum() > 0
    # gap: a deep moat ring around a surviving central platform
    c = 40
    assert h["gap"][c, c] == 0 and h["gap"].min() < -4.0
    # pit: sunken central square of depth ~= difficulty
    assert abs(h["pit"].min() + 0.8) < 0.02 and h["pit"][0, 0] == 0

    with pytest.raises(ValueError):
        _cell("lava")


def test_base_set_covers_all_branches():
    """The base Terrain.make_terrain dispatch (reference terrain.py:110-143):
    each proportion slot selects its primitive, pit is the remainder."""
    cfg = dataclasses.replace(
        TerrainCfg(),
        terrain_proportions=(0.125,) * 7,
    )
    vs = cfg.vertical_scale
    rng = np.random.RandomState(0)
    d = 0.8

    def cell(choice):
        return base_make_terrain(cfg, choice, d, 80, rng).height_field_raw \
            .astype(np.float64) * vs

    # slot 0 first half: downhill slope (negative heights)
    assert cell(0.03).min() < -0.5 and cell(0.03).max() == 0
    # slot 0 second half: uphill
    assert cell(0.10).max() > 0.5
    # slot 1: rough slope (slope + noise -> not pure multiples)
    assert cell(0.20).max() > 0.5
    # slots 2/3: stairs down / up
    assert cell(0.30).min() < -0.15 and cell(0.30).max() == 0
    up = cell(0.45)
    assert up.max() > 0.15 and up.min() == 0
    # slot 4: discrete obstacles
    dh = 0.05 + 0.2 * d
    assert set(np.round(np.unique(cell(0.55)) / (dh / 2)).astype(int)) <= {
        -2, -1, 0, 1, 2
    }
    # slot 5: stepping stones (deep floor)
    assert cell(0.70).min() <= -9.9
    # slot 6: gap (moat at -1000*vs)
    assert cell(0.80).min() < -4.0
    # remainder: pit of depth ~= difficulty
    pit = cell(0.95)
    assert abs(pit.min() + d) < 0.02


@needs_native
def test_native_base_world_matches_python():
    """C++ ht_build_world with generator_set=base: deterministic columns
    (slope, stairs, stones@max_height=0, gap, pit) bit-equal to NumPy."""
    cfg = dataclasses.replace(
        TerrainCfg(),
        mesh_type="trimesh", generator_set="base", num_rows=3, num_cols=8,
        border_size=2.0, terrain_proportions=(0.125,) * 7,
    )
    wn = build_terrain_native(cfg, seed=5)
    wp = build_terrain(cfg, seed=5)
    assert wn.height.shape == wp.height.shape
    assert np.allclose(wn.env_origins[:, :, :2], wp.env_origins[:, :, :2])
    size_px = int(cfg.terrain_length / cfg.horizontal_scale)
    bp = int(cfg.border_size / cfg.horizontal_scale)
    # curriculum choice = j/num_cols + 0.001 -> deterministic branches at
    # j = 0 (slope), 2,3 (stairs), 5 (stones, hmax=0), 6 (gap), 7 (pit)
    for j in (0, 2, 3, 5, 6, 7):
        sl = np.s_[bp : bp + cfg.num_rows * size_px,
                   bp + j * size_px : bp + (j + 1) * size_px]
        assert np.array_equal(wn.height[sl], wp.height[sl]), f"col {j}"


@needs_native
def test_native_selected_matches_python():
    for name in ("stairs", "gap", "pit", "slope"):
        cfg = dataclasses.replace(
            TerrainCfg(),
            mesh_type="trimesh", selected_type=name, num_rows=2,
            num_cols=2, border_size=1.0,
        )
        wn = build_terrain_native(cfg, seed=2)
        wp = build_terrain(cfg, seed=2)
        assert np.array_equal(wn.height, wp.height), name


# ---------------------------------------------------------------------------
# vertical-face sampling semantics
# ---------------------------------------------------------------------------

HS = 0.1
STEP_H = 0.3


def _step_terrain(wall: bool):
    """One 0.3 m step: columns 0..9 low (z=0), 10.. high (z=0.3).
    With hs=0.1 the raw bilinear surface is a 71-degree full-cell ramp
    between x=0.9 and x=1.0; trimesh mode turns it into a wall band of
    width wall_width*hs at the high edge."""
    h = np.zeros((20, 20), dtype=np.float64)
    h[10:, :] = STEP_H
    return Terrain(
        height=jnp.asarray(h, dtype=jnp.float32),
        horizontal_scale=HS,
        border=0.0,
        flat=False,
        wall_thresh=(0.75 * HS) if wall else 0.0,
        wall_width=0.1,
    )


def test_wall_sampling_stays_low_until_the_face():
    tw = _step_terrain(wall=True)
    tr = _step_terrain(wall=False)
    y = 1.0
    # mid-riser-cell: raw bilinear is halfway up the ramp; wall mode is
    # still at the low floor
    assert abs(float(tr.sample(jnp.array([0.95, y]))) - STEP_H / 2) < 1e-5
    assert float(tw.sample(jnp.array([0.95, y]))) < 1e-5
    # just past the face: both at the top
    for t in (tw, tr):
        assert abs(float(t.sample(jnp.array([1.005, y]))) - STEP_H) < 1e-5
    # inside the wall band the wall-mode gradient is ~10x the ramp's
    _, gxw, _ = tw.sample_with_grad(jnp.array([0.995, y]))
    _, gxr, _ = tr.sample_with_grad(jnp.array([0.95, y]))
    assert float(gxw) > 25.0 and 2.0 < float(gxr) < 4.0
    # wall-mode gradient on the flats is zero (it IS a wall, not a ramp)
    _, gx0, _ = tw.sample_with_grad(jnp.array([0.94, y]))
    assert abs(float(gx0)) < 1e-6
    # consistency: sample_with_grad height == sample everywhere, and the
    # gradient matches finite differences inside the band
    xs = jnp.stack(
        [jnp.linspace(0.905, 1.095, 41), jnp.full((41,), y)], axis=-1
    )
    hw, gx, gy = tw.sample_with_grad(xs)
    np.testing.assert_allclose(
        np.asarray(hw), np.asarray(tw.sample(xs)), atol=1e-6
    )
    eps = 1e-4
    gfd = (tw.sample(xs + jnp.array([eps, 0.0]))
           - tw.sample(xs - jnp.array([eps, 0.0]))) / (2 * eps)
    inner = np.abs(np.asarray(xs[:, 0]) - 0.99) > 2 * eps  # off the kinks
    inner &= np.abs(np.asarray(xs[:, 0]) - 1.00) > 2 * eps
    np.testing.assert_allclose(
        np.asarray(gx)[inner], np.asarray(gfd)[inner], rtol=1e-3, atol=1e-2
    )


def test_wall_contact_pushes_back_not_up():
    """A contact point just inside the riser: trimesh mode -> force is
    nearly horizontal (a wall pushing the foot back); raw heightfield mode
    -> deep 'penetration' against the ramp with a large vertical component
    (the foot gets lifted). This is the stairs-dynamics difference VERDICT
    missing #1 describes."""
    tw = _step_terrain(wall=True)
    tr = _step_terrain(wall=False)
    cp = ContactParams()
    pts = jnp.array([[0.998, 1.0, 0.05]])   # toe inside the wall band
    vels = jnp.array([[0.3, 0.0, 0.0]])     # walking into the face

    hw, gxw, gyw = tw.sample_with_grad(pts[..., 0:2])
    fw, fnw = _point_forces(pts, vels, hw, 0.8, cp, grads=(gxw, gyw))
    fw = np.asarray(fw)[0]
    assert fnw[0] > 0.0
    # wall: push-back dominates lift
    assert fw[0] < 0.0 and abs(fw[0]) > 5.0 * abs(fw[2])

    # zero-velocity (pure normal) comparison at the same point: the ramp
    # normal is ~72 deg from vertical (|fx|/fz ~ 3) while the wall band's
    # is ~88 deg (|fx|/fz ~ 30) -- the wall barely lifts at all
    v0 = jnp.zeros((1, 3))
    fw0, _ = _point_forces(pts, v0, hw, 0.8, cp, grads=(gxw, gyw))
    hr, gxr, gyr = tr.sample_with_grad(pts[..., 0:2])
    fr0, fnr = _point_forces(pts, v0, hr, 0.8, cp, grads=(gxr, gyr))
    fw0, fr0 = np.asarray(fw0)[0], np.asarray(fr0)[0]
    assert fr0[2] > 0 and fw0[2] > 0
    assert 2.0 < abs(fr0[0]) / fr0[2] < 4.0
    assert abs(fw0[0]) / fw0[2] > 15.0

    # before the face: the wall terrain exerts NO force at all (the foot
    # is on the low floor), while the raw ramp already collides
    pts2 = jnp.array([[0.95, 1.0, 0.05]])
    h2, gx2, gy2 = tw.sample_with_grad(pts2[..., 0:2])
    _, fn2 = _point_forces(pts2, jnp.zeros((1, 3)), h2, 0.8, cp,
                           grads=(gx2, gy2))
    assert float(fn2[0]) == 0.0
    h3, gx3, gy3 = tr.sample_with_grad(pts2[..., 0:2])
    _, fn3 = _point_forces(pts2, jnp.zeros((1, 3)), h3, 0.8, cp,
                           grads=(gx3, gy3))
    assert float(fn3[0]) > 0.0


# ---------------------------------------------------------------------------
# robot-level behavior: trimesh mode keeps the true floor at a riser
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def model():
    return load_urdf(XBOT_URDF, joint_order=XBOT_JOINT_ORDER, armature=0.01)


def _stand_at_riser(model, wall: bool, steps=50):
    """Robot standing mid-riser-cell of a 0.3 m step (hs=0.5 so the whole
    foot fits inside the cell). Raw heightfield mode interpolates a phantom
    ramp through the cell (surface 0.15 m under the feet -> deep fake
    penetration); trimesh/wall mode keeps the floor at the true low height
    until the face."""
    h = np.zeros((8, 8))
    h[2:, :] = 0.3                       # riser cell spans x in (0.5, 1.0)
    terrain = Terrain(
        height=jnp.asarray(h, dtype=jnp.float32), horizontal_scale=0.5,
        border=0.0, flat=False,
        # rise 0.3 over hs 0.5 is slope 0.6: below the default 0.75
        # threshold, so use 0.4 (thresh 0.2 m) to make it a wall
        wall_thresh=0.2 if wall else 0.0, wall_width=0.1,
    )
    params = default_phys_params(model)
    cp = ContactParams()
    kp = jnp.array([200.0, 200, 350, 350, 15, 15] * 2)
    kd = jnp.array([10.0] * 12)

    def torque_fn(s):
        return jnp.clip(kp * (0.0 - s.qj) - kd * s.u[6:], -170.0, 170.0)

    @jax.jit
    def step(s):
        return control_step(model, params, terrain, cp, s, torque_fn, 10,
                            0.001)

    s = PhysState(
        base_pos=jnp.array([0.75, 1.0, 0.886]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        qj=jnp.zeros(12),
        u=jnp.zeros(18),
    )
    zs = []
    for _ in range(steps):
        s, _ = step(s)
        zs.append(float(s.base_pos[2]))
    return np.array(zs), float(s.base_quat[0])


@pytest.mark.slow
def test_riser_cell_floor_is_true_in_trimesh_mode(model):
    """The stairs-dynamics gap VERDICT missing #1 describes, in robot form:
    standing mid-riser-cell, raw bilinear mode buries the feet in a phantom
    ramp (the robot is catapulted up and tips over), while trimesh mode
    stands normally on the low floor."""
    zw, qw_w = _stand_at_riser(model, wall=True)
    zr, qw_r = _stand_at_riser(model, wall=False)
    # wall mode: normal stand for the full 0.5 s, upright
    assert zw.min() > 0.82 and zw.max() < 0.95
    assert qw_w > 0.99
    # ramp mode: popped upward by the phantom surface, then tipping
    assert zr.max() > 0.93
    assert zr[-1] < 0.6 or qw_r < 0.95
    assert np.isfinite(zr).all() and np.isfinite(zw).all()


def test_uneven_generator_matches_oracle_spectrum():
    """The "uneven" slot must reproduce the reference terrain MJCF's
    statistics (uneven.png: independent ~1 m lattice nodes spanning 0.35 m
    at full difficulty) — NumPy and native paths both."""
    import numpy as np

    from humanoid_tpu.config.structs import TerrainCfg
    from humanoid_tpu.env.terrain import selected_make_terrain

    cfg = TerrainCfg()
    rng = np.random.RandomState(0)
    t = selected_make_terrain(cfg, "uneven", 1.0, 80, rng)
    h = t.height_field_raw * cfg.vertical_scale
    # full-difficulty amplitude ~ +-0.2 m (node heights hit the bounds)
    assert 0.15 <= h.max() <= 0.21 and -0.21 <= h.min() <= -0.15
    # long wavelength: adjacent 0.1 m samples differ far less than the
    # amplitude (bilinear between ~1 m nodes), unlike the 0.2 m rough slot
    dcol = np.abs(np.diff(h, axis=1)).max()
    assert dcol < 0.1, dcol
    # difficulty scales the amplitude
    t2 = selected_make_terrain(cfg, "uneven", 0.25, 80,
                               np.random.RandomState(0))
    h2 = t2.height_field_raw * cfg.vertical_scale
    assert abs(h2).max() <= 0.06


def test_uneven_world_slot_native_and_python():
    """Proportion slot 8 routes to the uneven generator in both the NumPy
    and C++ world assemblers (same bounds, same long-wavelength shape)."""
    import numpy as np
    import pytest

    from humanoid_tpu.config.structs import TerrainCfg
    from humanoid_tpu.env.terrain import build_terrain
    from humanoid_tpu.native.terrain_native import (
        build_terrain_native,
        native_available,
    )

    cfg = TerrainCfg(
        mesh_type="heightfield", num_rows=4, num_cols=4, border_size=2.0,
        terrain_proportions=(0.0, 0, 0, 0, 0, 0, 0, 1.0),
    )
    size_px = int(cfg.terrain_length / cfg.horizontal_scale)
    bp = int(cfg.border_size / cfg.horizontal_scale)
    for build in ([build_terrain, build_terrain_native]
                  if native_available() else [build_terrain]):
        w = build(cfg, seed=11)
        top = w.height[bp + 3 * size_px : bp + 4 * size_px,
                       bp : bp + size_px]          # difficulty 0.75
        assert 0.08 <= abs(top).max() <= 0.16, (build, abs(top).max())
        assert np.abs(np.diff(top, axis=1)).max() < 0.08
        flat_row = w.height[bp : bp + size_px, bp : bp + size_px]
        assert abs(flat_row).max() <= 0.01        # difficulty 0 stays flat
