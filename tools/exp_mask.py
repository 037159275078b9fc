"""Fused-field kernel variants attacking the VPU-bound triangle mask-gen.

The fused CP-field kernel (ops/field_fused.py) spends ~40% of its time
generating triangle weight masks w = relu(1 - |pos - u|) of shape
[R=257, TILE] per axis on the VPU. The MXU work (encode matmuls + heads) is
~50%. These run on different VLIW ports, so a schedule that overlaps them
could approach max() instead of sum(). Variants:

  V0  baseline: ops/field_fused.cp_field_fused (interleaved mask/matmul)
  V1  masks-first: build all 3 masks, then all matmuls — longer independent
      chains for the scheduler to co-issue
  V2  MXU diff: t = pos - u via a [R,2]@[2,TILE] matmul (1 VPU op saved)
  V3  split-pipeline: process the tile in 2 lane halves, explicit
      mask(h2) / matmul(h1) interleave
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_MAX = 257
F = 80
TILE = 4096
SH = 16


def timeit(fn, *args, reps=8, n_items=1):
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
    return n_items * reps / best


def _heads(h_enc, sh_ref, ws0, ws1, wc0, wc1, wc2, tile):
    h = jnp.maximum(jnp.dot(ws0[:], h_enc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.dot(ws1[:], h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    sigma = h[:1, :]
    hc = jnp.concatenate([sh_ref[:], h[1:, :].astype(jnp.bfloat16)], axis=0)
    h = jnp.maximum(jnp.dot(wc0[:], hc,
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.maximum(jnp.dot(wc1[:], h.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    rgb = jnp.dot(wc2[:], h.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return jnp.concatenate([rgb, sigma], axis=0)


# ---------------- V1: masks first, then matmuls ----------------

def _kernel_v1(x_ref, sh_ref, lt_ref, ws0, ws1, wc0, wc1, wc2, out_ref,
               *, r_max):
    tile = x_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    ws = []
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        ws.append(jnp.maximum(1.0 - jnp.abs(pos - u[None, :]),
                              0.0).astype(jnp.bfloat16))
    prod = None
    for axis in range(3):
        fa = jnp.dot(lt_ref[axis], ws[axis], preferred_element_type=jnp.float32)
        prod = fa if prod is None else prod * fa
    out_ref[:] = _heads(prod, sh_ref, ws0, ws1, wc0, wc1, wc2, tile)


# ---------------- V2: pos - u on the MXU ----------------

def _kernel_v2(x_ref, sh_ref, lt_ref, ws0, ws1, wc0, wc1, wc2, out_ref,
               *, r_max):
    tile = x_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    # lhs [r_max, 1] of ones; rhs = -u [1, tile]; pos + ones@(-u) = pos - u
    ones = jnp.ones((r_max, 8), jnp.bfloat16)
    prod = None
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        negu = (-u[None, :] * (1.0 / 8.0)).astype(jnp.bfloat16)
        t = pos + jnp.dot(ones, jnp.broadcast_to(negu, (8, tile)),
                          preferred_element_type=jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(t), 0.0).astype(jnp.bfloat16)
        fa = jnp.dot(lt_ref[axis], w, preferred_element_type=jnp.float32)
        prod = fa if prod is None else prod * fa
    out_ref[:] = _heads(prod, sh_ref, ws0, ws1, wc0, wc1, wc2, tile)


# ---------------- V3: two lane-halves, explicit interleave ----------------

def _kernel_v3(x_ref, sh_ref, lt_ref, ws0, ws1, wc0, wc1, wc2, out_ref,
               *, r_max):
    tile = x_ref.shape[1]
    half = tile // 2
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, half), 0).astype(jnp.float32)

    def mask(axis, lo):
        u = jnp.clip(x_ref[axis, lo:lo + half], 0.0, 1.0) * (r_max - 1)
        return jnp.maximum(1.0 - jnp.abs(pos - u[None, :]),
                           0.0).astype(jnp.bfloat16)

    outs = []
    for lo in (0, half):
        prod = None
        for axis in range(3):
            fa = jnp.dot(lt_ref[axis], mask(axis, lo),
                         preferred_element_type=jnp.float32)
            prod = fa if prod is None else prod * fa
        outs.append(prod)
    prod = jnp.concatenate(outs, axis=1)
    out_ref[:] = _heads(prod, sh_ref, ws0, ws1, wc0, wc1, wc2, tile)


def run_variant(kernel, x_t, sh_t, lt, wt):
    n = x_t.shape[1]
    ntiles = n // TILE
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(kernel, r_max=R_MAX),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SH, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, F, R_MAX), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["ws0"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["ws1"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc0"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc1"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc2"].shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
    )(x_t, sh_t, lt, wt["ws0"], wt["ws1"], wt["wc0"], wt["wc1"], wt["wc2"])


def main():
    key = jax.random.PRNGKey(0)
    M = 16384 * 128
    x_t = jax.random.uniform(key, (3, M))
    sh_t = jax.random.normal(jax.random.fold_in(key, 1), (SH, M)).astype(jnp.bfloat16)
    lt = jax.random.normal(jax.random.fold_in(key, 2), (3, F, R_MAX)).astype(jnp.bfloat16) * 0.1
    wt = {
        "ws0": (jax.random.normal(key, (64, F)) * 0.1).astype(jnp.bfloat16),
        "ws1": (jax.random.normal(key, (16, 64)) * 0.1).astype(jnp.bfloat16),
        "wc0": (jax.random.normal(key, (64, SH + 15)) * 0.1).astype(jnp.bfloat16),
        "wc1": (jax.random.normal(key, (64, 64)) * 0.1).astype(jnp.bfloat16),
        "wc2": (jax.random.normal(key, (3, 64)) * 0.1).astype(jnp.bfloat16),
    }

    from gbnerf_tpu.ops.field_fused import _kernel as kernel_v0

    for name, kern in [("v0_baseline", kernel_v0), ("v1_masks_first", _kernel_v1),
                       ("v2_mxu_diff", _kernel_v2), ("v3_split_halves", _kernel_v3)]:
        if name == "v0_baseline":
            k = functools.partial(kernel_v0, sigma_only=False)
            def fn(i, x, s, l, *w):
                return jnp.sum(run_variant(k, x + i * 1e-7, s, l, wt)[3])
        else:
            def fn(i, x, s, l, *w, _k=kern):
                return jnp.sum(run_variant(_k, x + i * 1e-7, s, l, wt)[3])
        try:
            r = timeit(fn, x_t, sh_t, lt, reps=8, n_items=M)
            print(json.dumps({"variant": name, "M_pts_s": round(r / 1e6, 1)}))
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
