"""Pallas heightfield sampler: per-env terrain tile DMA + one-hot matmul.

Why: heightfield terrain needs, every control step, (a) the 17x11=187-point
height scan under each robot (reference legged_robot.py:914-966, fed to the
critic obs) and (b) local tangent planes at the ~9 contact points (the fused
physics kernel's terrain_planes input). Both are batched table lookups, and
elementwise gathers are the one op class this TPU handles terribly: ONE
(4096, 187) gather from the 10.9 MB heightfield measures 8.2 ms on v5e —
the XLA path needs 7 of them, which is the measured ~70 k env-steps/s
terrain cliff (VALIDATION.md round 3, VERDICT r3 next #1).

The TPU-native formulation (this file):

  * The heightfield raster is int16 counts x vertical_scale (exactly the
    reference's terrain representation, isaacgym terrain_utils /
    utils/terrain.py: int16 height_field_raw) — so int16 tiles are EXACT.
  * Host-side (once), the raster is re-tiled into overlapping tiles of
    48 x 128 cells (4.8 m x 12.8 m) on a (16, 64)-cell stride grid, each
    stored TRANSPOSED as (2, 128, 48) int16 — channel 0 the raw heights,
    channel 1 the min3 table  M3[i,j] = min(H[i,j], H[i+1,j], H[i,j+1]),
    which turns the reference's conservative 3-cell height probe
    (humanoid_env.py:973-979) into a single lookup. The stride/size pair
    guarantees any +-1.3 m window around a base position falls inside ONE
    tile (window 28 cells; a 48-cell tile on stride 16 covers any 28-cell
    window aligned within [a-20, a]).
  * Per control step, ONE pallas_call: the grid runs env-blocks of E=16;
    each env's tile arrives by scalar-prefetch block index (pipelined HBM
    DMA — 4096 tile fetches measure ~0.5 ms, vs 8 ms for one gather), and
    corner heights are extracted with one-hot MATMULS on the MXU instead
    of gathers: for points p with cell coords (x0, y0) inside the tile,
        G = tileT @ onehot(x0)        # (128, 48) @ (48, P) on the MXU
        h[p] = sum_y G[y, p] * (y == y0[p])
    The scan channel runs in bf16 (error <= ~1 cm on the +-2 m relief,
    far below the 0.1 height-measurement obs noise); the contact channel
    runs in f32, where one-hot products of int16-exact values are EXACT.

Outputs are raw corner heights (in counts); the bilinear / vertical-face
(trimesh slope_treshold) interpolation stays in physics/contact.py
(Terrain.interp_from_corners), bit-matching the XLA path's math.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TR, TC = 48, 128        # tile size in cells (x rows, y cols)
SX, SY = 16, 64         # tile grid stride in cells
PS_PAD = 256            # scan-point lane padding (187 -> 256)
PC_PAD = 64             # contact-point lane padding (<= 64)


class TerrainTiles(NamedTuple):
    tiles: jnp.ndarray      # (ntx*nty, 2, TC, TR) int16, transposed tiles
    ntx: int
    nty: int
    vs: float               # vertical scale [m per count]
    hs: float               # horizontal scale [m per cell]
    border: float           # [m]
    Hr: int                 # unpadded raster rows
    Wc: int                 # unpadded raster cols


def build_tiles(height_m: np.ndarray, vs: float, hs: float,
                border: float) -> TerrainTiles:
    """Host-side one-time tiling of the heightfield (numpy)."""
    Hq = np.round(np.asarray(height_m, dtype=np.float64) / vs)
    assert np.abs(Hq).max() < 32000, "heightfield exceeds int16 counts"
    Hq = Hq.astype(np.int16)
    Hr, Wc = Hq.shape
    # min3 table with edge replication (never read at the far edges: the
    # scan clips its cell index to [0, Hr-2] x [0, Wc-2])
    dn = np.vstack([Hq[1:], Hq[-1:]])
    rt = np.hstack([Hq[:, 1:], Hq[:, -1:]])
    M3 = np.minimum(Hq, np.minimum(dn, rt))
    ntx = max(1, -(-(Hr - TR) // SX) + 1)
    nty = max(1, -(-(Wc - TC) // SY) + 1)
    pr = SX * (ntx - 1) + TR
    pc = SY * (nty - 1) + TC
    pad = ((0, max(0, pr - Hr)), (0, max(0, pc - Wc)))
    Hp = np.pad(Hq, pad, mode="edge")
    M3p = np.pad(M3, pad, mode="edge")
    tiles = np.empty((ntx * nty, 2, TC, TR), dtype=np.int16)
    for i in range(ntx):
        for j in range(nty):
            sl = (slice(SX * i, SX * i + TR), slice(SY * j, SY * j + TC))
            tiles[i * nty + j, 0] = Hp[sl].T
            tiles[i * nty + j, 1] = M3p[sl].T
    return TerrainTiles(
        tiles=jnp.asarray(tiles), ntx=ntx, nty=nty, vs=float(vs),
        hs=float(hs), border=float(border), Hr=Hr, Wc=Wc,
    )


def tile_coords(tt: TerrainTiles, base_xy):
    """Per-env tile id + tile origin (in cells) from the base position.
    The tile is chosen so every point within +-1.3 m (13 cells) of the
    base falls inside it."""
    cbx = (base_xy[..., 0] + tt.border) / tt.hs
    cby = (base_xy[..., 1] + tt.border) / tt.hs
    tx = jnp.clip(
        jnp.floor((cbx - 13.0) / SX).astype(jnp.int32), 0, tt.ntx - 1
    )
    ty = jnp.clip(
        jnp.floor((cby - 13.0) / SY).astype(jnp.int32), 0, tt.nty - 1
    )
    return tx * tt.nty + ty, (tx * SX).astype(jnp.float32), \
        (ty * SY).astype(jnp.float32)


def _sampler_kernel(E, vs, idx_ref, *refs):
    tiles = refs[:E]
    s_rx, s_ry, c_rx, c_ry, out_s, out_c = refs[E:E + 6]
    f32 = jnp.float32
    i32 = jnp.int32
    it48s = jax.lax.broadcasted_iota(i32, (TR, PS_PAD), 0)
    it128s = jax.lax.broadcasted_iota(i32, (TC, PS_PAD), 0)
    it48c = jax.lax.broadcasted_iota(i32, (TR, PC_PAD), 0)
    it128c = jax.lax.broadcasted_iota(i32, (TC, PC_PAD), 0)
    for e in range(E):
        t2 = tiles[e][0]                              # (2, TC, TR) int16
        hfT = t2[0].astype(f32)                       # (TC, TR) counts
        hmT = t2[1].astype(jnp.bfloat16)
        # --- scan: single min3-table lookup per point, bf16 matmul ---
        sx0 = jnp.floor(s_rx[e:e + 1, :]).astype(i32)  # (1, PS_PAD)
        sy0 = jnp.floor(s_ry[e:e + 1, :]).astype(i32)
        ox = (it48s == sx0).astype(jnp.bfloat16)      # (TR, PS_PAD)
        g = jax.lax.dot_general(
            hmT, ox, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                             # (TC, PS_PAD)
        oy = (it128s == sy0).astype(f32)
        out_s[e:e + 1, :] = jnp.sum(g * oy, axis=0, keepdims=True)
        # --- contact corners: 4 exact f32 lookups per point ---
        cx0 = jnp.floor(c_rx[e:e + 1, :]).astype(i32)  # (1, PC_PAD)
        cy0 = jnp.floor(c_ry[e:e + 1, :]).astype(i32)
        ox0 = (it48c == cx0).astype(f32)
        ox1 = (it48c == cx0 + 1).astype(f32)
        a0 = jax.lax.dot_general(
            hfT, ox0, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )                                             # (TC, PC_PAD)
        a1 = jax.lax.dot_general(
            hfT, ox1, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        oy0 = (it128c == cy0).astype(f32)
        oy1 = (it128c == cy0 + 1).astype(f32)
        h00 = jnp.sum(a0 * oy0, axis=0, keepdims=True)
        h01 = jnp.sum(a0 * oy1, axis=0, keepdims=True)
        h10 = jnp.sum(a1 * oy0, axis=0, keepdims=True)
        h11 = jnp.sum(a1 * oy1, axis=0, keepdims=True)
        out_c[e:e + 1, :] = jnp.concatenate([h00, h10, h01, h11], axis=1)


def build_sampler(tt: TerrainTiles, N: int, E: int = 16,
                  interpret: bool = False):
    """Returns sample(tile_id (N,), s_rx, s_ry (N,<=PS_PAD), c_rx, c_ry
    (N,<=PC_PAD)) -> (scan_min3 (N,PS_PAD), corners (N,4*PC_PAD)), all in
    COUNTS (callers scale by tt.vs). Rel coords are tile-local cells."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert N % E == 0 and E % 8 == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // E,),
        in_specs=[
            pl.BlockSpec(
                (1, 2, TC, TR),
                index_map=functools.partial(
                    lambda k, i, idx: (idx[i * E + k], 0, 0, 0), k
                ),
            )
            for k in range(E)
        ] + [
            pl.BlockSpec((E, PS_PAD), lambda i, idx: (i, 0)),
            pl.BlockSpec((E, PS_PAD), lambda i, idx: (i, 0)),
            pl.BlockSpec((E, PC_PAD), lambda i, idx: (i, 0)),
            pl.BlockSpec((E, PC_PAD), lambda i, idx: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((E, PS_PAD), lambda i, idx: (i, 0)),
            pl.BlockSpec((E, 4 * PC_PAD), lambda i, idx: (i, 0)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_sampler_kernel, E, tt.vs),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, PS_PAD), jnp.float32),
            jax.ShapeDtypeStruct((N, 4 * PC_PAD), jnp.float32),
        ],
        interpret=interpret,
    )

    def pad_to(x, w):
        return jnp.pad(x, ((0, 0), (0, w - x.shape[1])))

    def sample(tile_id, s_rx, s_ry, c_rx, c_ry):
        args = (
            pad_to(s_rx, PS_PAD), pad_to(s_ry, PS_PAD),
            pad_to(c_rx, PC_PAD), pad_to(c_ry, PC_PAD),
        )
        return call(tile_id, *([tt.tiles] * E), *args)

    return sample


class TerrainSampler:
    """Env-facing wrapper: world-xy points in, heights/corners out.

    sample(base_xy, scan_xy, con_xy) -> (scan_h (N,Ps) meters,
    (h00, h10, h01, h11, tx, ty) each (N,Pc) for
    Terrain.interp_from_corners)."""

    def __init__(self, height_m, vs, hs, border, N, E: int = 16,
                 interpret: bool = False):
        self.tt = build_tiles(np.asarray(height_m), vs, hs, border)
        self.N = N
        self._fn = build_sampler(self.tt, N, E=E, interpret=interpret)

    def sample(self, base_xy, scan_xy, con_xy):
        tt = self.tt
        tid, ox, oy = tile_coords(tt, base_xy)
        # scan: the reference's conservative probe floors the cell index,
        # clipped to [0, Hr-2] x [0, Wc-2] (sample_min3 semantics)
        sfx = jnp.clip(
            jnp.floor((scan_xy[..., 0] + tt.border) / tt.hs), 0, tt.Hr - 2
        )
        sfy = jnp.clip(
            jnp.floor((scan_xy[..., 1] + tt.border) / tt.hs), 0, tt.Wc - 2
        )
        # contact corners: bilinear clip to [0, dim-1.001] (Terrain._corners)
        cfx = jnp.clip(
            (con_xy[..., 0] + tt.border) / tt.hs, 0.0, tt.Hr - 1.001
        )
        cfy = jnp.clip(
            (con_xy[..., 1] + tt.border) / tt.hs, 0.0, tt.Wc - 1.001
        )
        rel = lambda f, o, m: jnp.clip(f - o[:, None], 0.0, m)
        scan_c, corners_c = self._fn(
            tid,
            rel(sfx, ox, TR - 1), rel(sfy, oy, TC - 1),
            rel(cfx, ox, TR - 1.001), rel(cfy, oy, TC - 1.001),
        )
        Ps = scan_xy.shape[1]
        Pc = con_xy.shape[1]
        scan_h = scan_c[:, :Ps] * tt.vs
        c = corners_c.reshape(-1, 4, PC_PAD)[:, :, :Pc] * tt.vs
        rx = rel(cfx, ox, TR - 1.001)
        ry = rel(cfy, oy, TC - 1.001)
        tx = rx - jnp.floor(rx)
        ty = ry - jnp.floor(ry)
        return scan_h, (c[:, 0], c[:, 1], c[:, 2], c[:, 3], tx, ty)
