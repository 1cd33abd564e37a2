"""Probe: cost of per-env heightfield-tile fetches on the real chip.

Variant A: pallas pipeline fetch via scalar-prefetch index_map, E tiles
           per grid step (H_tiles passed E times with offset index maps).
Variant B: manual in-kernel async DMAs from an ANY-space ref.

Both just sum the fetched tiles (forcing the fetch); N=4096 tiles of
(48,128) f32 = 100 MB — the bandwidth floor is ~0.13 ms, so anything
above that is issue/pipeline overhead.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
TR, TC = 48, 128
NTILE = 512


def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.3f} ms")
    return out


def variant_a(E):
    def kernel(idx_ref, *refs):
        tiles, out = refs[:E], refs[E]
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(E):
            acc = acc + tiles[k][0, :8, :]
        out[...] = acc[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // E,),
        in_specs=[
            pl.BlockSpec(
                (1, TR, TC),
                index_map=functools.partial(
                    lambda k, i, idx_ref: (idx_ref[i * E + k], 0, 0), k
                ),
            )
            for k in range(E)
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, idx_ref: (i, 0, 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N // E, 8, 128), jnp.float32),
    )

    return jax.jit(lambda idx, tiles: f(idx, *([tiles] * E)))


def variant_b(E):
    def kernel(idx_ref, tiles_hbm, out, patch, sem):
        i = pl.program_id(0)

        def issue(k, _):
            t = idx_ref[i * E + k]
            pltpu.make_async_copy(
                tiles_hbm.at[t], patch.at[k], sem
            ).start()
            return 0

        jax.lax.fori_loop(0, E, issue, 0)

        def wait(k, _):
            pltpu.make_async_copy(
                tiles_hbm.at[idx_ref[i * E + k]], patch.at[k], sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, E, wait, 0)
        out[...] = jnp.sum(patch[...], axis=0)[None, :8, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // E,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, TC), lambda i, idx_ref: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((E, TR, TC), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N // E, 8, TC), jnp.float32),
    )
    return jax.jit(f)


def main():
    key = jax.random.PRNGKey(0)
    tiles = jax.random.normal(key, (NTILE, TR, TC), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, NTILE,
                             dtype=jnp.int32)
    for E in (8, 16, 32):
        try:
            bench(f"A: pipeline fetch E={E}", variant_a(E), idx, tiles)
        except Exception as e:
            print(f"A E={E} failed: {type(e).__name__}: {str(e)[:200]}")
    for E in (8, 32, 64):
        try:
            bench(f"B: manual DMA E={E}", variant_b(E), idx, tiles)
        except Exception as e:
            print(f"B E={E} failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
