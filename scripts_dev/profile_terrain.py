"""Dev tool: where does the heightfield-terrain task's time go? (VERDICT r3
next #1: terrain tasks observed at ~70 k env-steps/s in-run vs 3.3 M flat.)

Times, separately jitted, on the real chip at 4096 envs:
  1. flat-task env.step (baseline)
  2. terrain-task env.step (the regression)
  3. the 187-point height scan alone (sample_min3: 3 elementwise gathers)
  4. _contact_planes alone (FK + sample_with_grad: 4 gathers)
  5. candidate fix: per-env patch dynamic-slice + one-hot matmul corner
     fetch (the gather-free formulation)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_tpu.utils import registry

N = 4096


def bench(name, fn, *args, reps=5, div=1):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ms = min(ts) * 1e3
    print(f"{name:44s} {ms:9.3f} ms   ({N/min(ts)/1e6:7.2f} M env-steps/s "
          f"if per-control-step)")
    return out


def env_step_bench(task, name, **cfg_over):
    cfg, _ = registry.get_cfgs(task)
    if cfg_over:
        cfg = cfg.replace(**cfg_over)
    env, _ = registry.make_env(task, env_cfg=cfg)
    s = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((N, env.nj))
    k = jax.random.PRNGKey(1)
    t0 = time.time()
    s2, _ = step(s, a, k)
    jax.block_until_ready(s2.phys.qj)
    print(f"  [{name} compile: {time.time()-t0:.1f} s]")
    bench(name, lambda: step(s, a, k)[0].phys.qj)
    return env, s


def main():
    print(f"backend={jax.default_backend()}  N={N}")
    env_f, _ = env_step_bench("humanoid_ppo", "flat env.step (pgs)")
    env_t, st = env_step_bench("humanoid_ppo_terrain", "terrain env.step (pgs)")

    terrain = env_t.terrain
    H = terrain.height
    print(f"heightfield shape {H.shape} ({H.size*4/1e6:.1f} MB)")

    # --- 3. the height scan alone ---
    key = jax.random.PRNGKey(2)
    base_xy = jax.random.uniform(key, (N, 2), minval=30.0, maxval=90.0)
    pts = base_xy[:, None, :] + jax.random.uniform(
        jax.random.PRNGKey(3), (N, 187, 2), minval=-0.95, maxval=0.95
    )
    scan3 = jax.jit(lambda p: terrain.sample_min3(p))
    bench("sample_min3 (N,187): 3 gathers", scan3, pts)

    swg = jax.jit(lambda p: terrain.sample_with_grad(p))
    pts9 = pts[:, :9, :]
    bench("sample_with_grad (N,9): 4 gathers", swg, pts9)

    cp = jax.jit(lambda ph: env_t._contact_planes(ph))
    bench("_contact_planes (FK + sample)", cp, st.phys)

    # --- 5. candidate: patch dynamic-slice + one-hot matmul corners ---
    PR, PC = 48, 128   # patch rows x cols (cells)
    hs = terrain.horizontal_scale

    def corners_patch(pts, P):
        fx = (pts[..., 0] + terrain.border) / hs          # (N, P)
        fy = (pts[..., 1] + terrain.border) / hs
        Hr, Wc = H.shape
        fx = jnp.clip(fx, 0.0, Hr - 1.001)
        fy = jnp.clip(fy, 0.0, Wc - 1.001)
        # per-env patch origin from the first point (stand-in for base pos)
        ox = jnp.clip(fx.min(axis=1).astype(jnp.int32) - 8, 0, Hr - PR)
        oy = jnp.clip(fy.min(axis=1).astype(jnp.int32) - 8, 0, Wc - PC)
        patch = jax.vmap(
            lambda x0, y0: jax.lax.dynamic_slice(H, (x0, y0), (PR, PC))
        )(ox, oy)                                          # (N, PR, PC)
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        rx = x0 - ox[:, None]                              # in [0, PR)
        ry = y0 - oy[:, None]
        lanes_r = jnp.arange(PR, dtype=jnp.int32)
        lanes_c = jnp.arange(PC, dtype=jnp.int32)
        ox0 = (rx[..., None] == lanes_r).astype(H.dtype)       # (N,P,PR)
        ox1 = (rx[..., None] + 1 == lanes_r).astype(H.dtype)
        oy0 = (ry[..., None] == lanes_c).astype(H.dtype)       # (N,P,PC)
        oy1 = (ry[..., None] + 1 == lanes_c).astype(H.dtype)
        a0 = jnp.einsum("npr,nrc->npc", ox0, patch)        # rows at x0
        a1 = jnp.einsum("npr,nrc->npc", ox1, patch)        # rows at x0+1
        h00 = jnp.sum(a0 * oy0, -1)
        h01 = jnp.sum(a0 * oy1, -1)
        h10 = jnp.sum(a1 * oy0, -1)
        h11 = jnp.sum(a1 * oy1, -1)
        return h00, h10, h01, h11, fx - x0, fy - y0

    cpk = jax.jit(lambda p: corners_patch(p, 187))
    bench("patch-matmul corners (N,187)", cpk, pts)
    # correctness vs the gather path
    h00, h10, h01, h11, tx, ty = cpk(pts)
    href = terrain.sample(pts)
    hnew = (h00 * (1 - tx) * (1 - ty) + h10 * tx * (1 - ty)
            + h01 * (1 - tx) * ty + h11 * tx * ty)
    err = float(jnp.max(jnp.abs(hnew - href)))
    print(f"patch-matmul vs gather bilinear max err: {err:.2e}")

    cpk9 = jax.jit(lambda p: corners_patch(p, 9))
    bench("patch-matmul corners (N,9)", cpk9, pts9)


if __name__ == "__main__":
    main()
