"""TILE sweeps for the proposal-coarse sigma kernel and the bitonic merge.

The flagship render is ~0.13 ms short of 2.0x target. Coarse sigma pass
(R_max=65) runs at the fine kernel's TILE=4096; its mask is 4x smaller so
bigger tiles fit VMEM. Merge kernel at _MERGE_TILE=1024.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gbnerf_tpu.ops import field_fused as ff
from gbnerf_tpu.ops import resample as rs


def timeit(fn, *args, reps=64):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            return acc + fn(i, *a) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    float(timed(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def sigma_variant(tile, x01, ulines, ws0, ws1):
    n = x01.shape[0]
    r_max, feat = ulines.shape[1], ulines.shape[2]
    ntiles = -(-n // tile)
    x_t = x01.T
    lt = jnp.transpose(ulines, (0, 2, 1)).astype(jnp.bfloat16)
    w0t = ws0.T.astype(jnp.bfloat16)
    w1t = ws1.T.astype(jnp.bfloat16)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(ff._kernel_sigma, r_max=r_max),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, feat, r_max), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w0t.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1t.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ntiles * tile), jnp.float32),
    )(x_t, lt, w0t, w1t)
    return out


def main():
    key = jax.random.PRNGKey(0)
    n = 16384 * 64          # coarse pass: 64 samples
    R, F = 65, 24           # proposal (17,33,65) r8: 3 levels x rank 8
    x01 = jax.random.uniform(key, (n, 3))
    ul = jax.random.normal(jax.random.fold_in(key, 1), (3, R, F)) * 0.1
    ws0 = jax.random.normal(jax.random.fold_in(key, 2), (F, 64)) * 0.1
    ws1 = jax.random.normal(jax.random.fold_in(key, 3), (64, 16)) * 0.1

    for tile in (4096, 8192, 16384):
        def fn(i, x, u, a, b, _t=tile):
            return jnp.sum(sigma_variant(_t, x + i * 1e-7, u, a, b)[3])
        try:
            t = timeit(fn, x01, ul, ws0, ws1)
            print(json.dumps({"sigma_tile": tile, "ms": round(t, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"sigma_tile": tile, "error": str(e)[:200]}),
                  flush=True)

    a = jnp.sort(jax.random.uniform(key, (16384, 64)), -1)
    b = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 5), (16384, 64)),
                 -1)
    for mt in (512, 1024, 2048, 4096):
        rs._MERGE_TILE = mt

        def fn(i, x, y):
            return jnp.sum(rs._merge128_fwd(x + i * 1e-7, y))
        try:
            t = timeit(fn, a, b, reps=128)
            print(json.dumps({"merge_tile": mt, "ms": round(t, 4)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"merge_tile": mt, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
