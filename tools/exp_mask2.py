"""Round 2 of fused-field mask-gen experiments: bf16 VPU arithmetic.

The fine field kernel is ~85% of the flagship render (tools/exp_split.py);
its VPU-bound part is the triangle mask chain
    t = pos - u; w = relu(1 - |t|); cast bf16
(5 f32 vector ops per [257, tile] element, 3 axes). bf16 VPU ops can pack
2 lanes; the mask VALUES only matter where |t| < 1, and bf16 resolves
2^-9 there — so everything after the f32 subtract can run in bf16 without
touching interpolation accuracy.

  V0  production split-halves kernel (f32 chain)
  V4  f32 subtract -> bf16 abs/1-/relu
  V5  all-bf16: u split into integer+fraction (both bf16-exact),
      t = (pos_bf16 - ui) - uf  (integer diffs <=256 exact in bf16)
  V6  V4 + quarter splits (tile/4)
  V7  V4 at TILE=8192
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
SH = 16


def timeit(fn, *args, reps=16, n_items=1):
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


def _heads(h_enc, sh_ref, ws0, ws1, wc0, wc1, wc2):
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


def _encode_generic(x_ref, lt_ref, r_max, tile, nsplit, maskfn):
    part = tile // nsplit
    outs = []
    for s in range(nsplit):
        lo = s * part
        prod = None
        for axis in range(3):
            fa = jnp.dot(lt_ref[axis], maskfn(x_ref, axis, lo, part, r_max),
                         preferred_element_type=jnp.float32)
            prod = fa if prod is None else prod * fa
        outs.append(prod)
    return jnp.concatenate(outs, axis=1)


def mask_f32(x_ref, axis, lo, part, r_max):
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, part), 0).astype(
        jnp.float32)
    u = jnp.clip(x_ref[axis, lo:lo + part], 0.0, 1.0) * (r_max - 1)
    return jnp.maximum(1.0 - jnp.abs(pos - u[None, :]), 0.0).astype(
        jnp.bfloat16)


def mask_v4(x_ref, axis, lo, part, r_max):
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, part), 0).astype(
        jnp.float32)
    u = jnp.clip(x_ref[axis, lo:lo + part], 0.0, 1.0) * (r_max - 1)
    t = (pos - u[None, :]).astype(jnp.bfloat16)
    one = jnp.bfloat16(1.0)
    return jnp.maximum(one - jnp.abs(t), jnp.bfloat16(0.0))


def mask_v5(x_ref, axis, lo, part, r_max):
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, part), 0).astype(
        jnp.bfloat16)
    u = jnp.clip(x_ref[axis, lo:lo + part], 0.0, 1.0) * (r_max - 1)
    ui = jnp.floor(u)
    uf = (u - ui).astype(jnp.bfloat16)[None, :]
    t = (pos - ui.astype(jnp.bfloat16)[None, :]) - uf
    return jnp.maximum(jnp.bfloat16(1.0) - jnp.abs(t), jnp.bfloat16(0.0))


def make_kernel(nsplit, maskfn):
    def kern(x_ref, sh_ref, lt_ref, ws0, ws1, wc0, wc1, wc2, out_ref,
             *, r_max):
        tile = x_ref.shape[1]
        prod = _encode_generic(x_ref, lt_ref, r_max, tile, nsplit, maskfn)
        out_ref[:] = _heads(prod, sh_ref, ws0, ws1, wc0, wc1, wc2)
    return kern


def run_variant(kernel, x_t, sh_t, lt, wt, tile):
    n = x_t.shape[1]
    ntiles = n // tile
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(kernel, r_max=R_MAX),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, F, R_MAX), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["ws0"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["ws1"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc0"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc1"].shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wt["wc2"].shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
    )(x_t, sh_t, lt, wt["ws0"], wt["ws1"], wt["wc0"], wt["wc1"], wt["wc2"])


def main():
    key = jax.random.PRNGKey(0)
    M = 16384 * 128
    x_t = jax.random.uniform(key, (3, M))
    sh_t = jax.random.normal(jax.random.fold_in(key, 1), (SH, M)).astype(
        jnp.bfloat16)
    lt = jax.random.normal(jax.random.fold_in(key, 2),
                           (3, F, R_MAX)).astype(jnp.bfloat16) * 0.1
    wt = {
        "ws0": (jax.random.normal(key, (64, F)) * 0.1).astype(jnp.bfloat16),
        "ws1": (jax.random.normal(key, (16, 64)) * 0.1).astype(jnp.bfloat16),
        "wc0": (jax.random.normal(key, (64, SH + 15)) * 0.1).astype(
            jnp.bfloat16),
        "wc1": (jax.random.normal(key, (64, 64)) * 0.1).astype(jnp.bfloat16),
        "wc2": (jax.random.normal(key, (3, 64)) * 0.1).astype(jnp.bfloat16),
    }

    variants = [
        ("v0_prod_f32_halves", make_kernel(2, mask_f32), 4096),
        ("v4_bf16_after_sub", make_kernel(2, mask_v4), 4096),
        ("v5_all_bf16", make_kernel(2, mask_v5), 4096),
        ("v6_bf16_quarters", make_kernel(4, mask_v4), 4096),
        ("v7_bf16_tile8192", make_kernel(2, mask_v4), 8192),
    ]
    # correctness reference from v0
    xs = x_t[:, :8192]
    shs = sh_t[:, :8192]
    ref = None
    for name, kern, tile in variants:
        try:
            got = run_variant(kern, xs, shs, lt, wt, tile if tile <= 8192
                              else 8192)
            if ref is None:
                ref = got
            err = float(jnp.max(jnp.abs(got - ref)))
            scale = float(jnp.max(jnp.abs(ref)))

            def fn(i, x, s, l, *w, _k=kern, _t=tile):
                return jnp.sum(run_variant(_k, x + i * 1e-7, s, l, wt, _t)[3])

            r = timeit(fn, x_t, sh_t, lt, reps=8, n_items=M)
            print(json.dumps({"variant": name, "M_pts_s": round(r / 1e6, 1),
                              "maxerr_vs_v0": round(err, 6),
                              "scale": round(scale, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
