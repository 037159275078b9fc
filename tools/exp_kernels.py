"""Kernel experiments: transposed-layout Pallas encode/field + r2o variants.

Layout idea: keep everything [features, points] so triangle weights generate
as [r_max(sublanes), TILE(lanes)] — ~1.45x fewer padded vreg elements than
[TILE, r_max] — and every contraction is a standard [M,K]@[K,N] matmul with
weights-as-lhs (no transposes inside the kernel).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_MAX = 257
F = 80


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


# ---------------- E2: transposed encode-only kernel ----------------

def _enc_kernel(x_ref, lt_ref, out_ref, *, r_max, tile):
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    prod = None
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        w = jnp.maximum(1.0 - jnp.abs(pos - u[None, :]), 0.0).astype(jnp.bfloat16)
        fa = jnp.dot(lt_ref[axis], w, preferred_element_type=jnp.float32)  # [F, tile]
        prod = fa if prod is None else prod * fa
    out_ref[:] = prod


def enc_transposed(x_t, lt, tile):
    n = x_t.shape[1]
    ntiles = n // tile
    return pl.pallas_call(
        functools.partial(_enc_kernel, r_max=R_MAX, tile=tile),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, F, R_MAX), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n), jnp.float32),
    )(x_t, lt)


# ---------------- E3: fused encode + sigma/color MLP ----------------

def _field_kernel(x_ref, sh_ref, lt_ref, ws0_ref, ws1_ref, wc0_ref, wc1_ref,
                  wc2_ref, out_ref, *, r_max, tile, with_color):
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, tile), 0).astype(jnp.float32)
    prod = None
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        w = jnp.maximum(1.0 - jnp.abs(pos - u[None, :]), 0.0).astype(jnp.bfloat16)
        fa = jnp.dot(lt_ref[axis], w, preferred_element_type=jnp.float32)
        prod = fa if prod is None else prod * fa
    h = jnp.maximum(jnp.dot(ws0_ref[:], prod.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.dot(ws1_ref[:], h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)               # [16, tile]
    sigma = h[:1, :]
    if with_color:
        hc = jnp.concatenate([sh_ref[:], h[1:, :].astype(jnp.bfloat16)], axis=0)
        h = jnp.maximum(jnp.dot(wc0_ref[:], hc,
                                preferred_element_type=jnp.float32), 0.0)
        h = jnp.maximum(jnp.dot(wc1_ref[:], h.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), 0.0)
        rgb = jnp.dot(wc2_ref[:], h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)         # [3, tile]
        out_ref[:] = jnp.concatenate([rgb, sigma], axis=0)
    else:
        out_ref[:] = jnp.concatenate(
            [jnp.zeros((3, tile), jnp.float32), sigma], axis=0)


def field_fused(x_t, sh_t, lt, Ws, tile, with_color=True):
    n = x_t.shape[1]
    ntiles = n // tile
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_field_kernel, r_max=R_MAX, tile=tile,
                          with_color=with_color),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, F, R_MAX), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 64), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 31), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 64), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
    )(x_t, sh_t, lt, Ws["s0"], Ws["s1"], Ws["c0"], Ws["c1"], Ws["c2"])


def main():
    key = jax.random.PRNGKey(0)
    M = 16384 * 128
    x_t = jax.random.uniform(key, (3, M))
    sh_t = jax.random.normal(jax.random.fold_in(key, 1), (16, M), jnp.bfloat16)
    ulines = jax.random.normal(jax.random.fold_in(key, 2), (3, R_MAX, F)) * 0.1
    lt = jnp.transpose(ulines, (0, 2, 1)).astype(jnp.bfloat16)  # [3, F, R_MAX]
    Ws = {
        "s0": jax.random.normal(key, (64, F), jnp.bfloat16) * 0.1,
        "s1": jax.random.normal(key, (16, 64), jnp.bfloat16) * 0.1,
        "c0": jax.random.normal(key, (64, 31), jnp.bfloat16) * 0.1,
        "c1": jax.random.normal(key, (64, 64), jnp.bfloat16) * 0.1,
        "c2": jax.random.normal(key, (3, 64), jnp.bfloat16) * 0.1,
    }

    # correctness of E2 vs XLA oracle
    from gbnerf_tpu.ops.cp_pallas import _xla_impl
    small = x_t[:, :2048]
    ref = _xla_impl(small.T, ulines, R_MAX)
    got = enc_transposed(small, lt, 512).T
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"check": "enc_transposed_maxerr", "err": err}))

    for tile in (512, 1024, 2048):
        def e2(i, x, lt):
            return jnp.sum(enc_transposed(
                jnp.clip(x + i * 1e-7, 0, 1), lt, tile)[0])
        r = timeit(e2, x_t, lt, reps=8, n_items=M)
        print(json.dumps({"exp": f"enc_transposed_t{tile}",
                          "M_pts_s": round(r / 1e6, 1)}))

    for tile in (512, 1024):
        def e3(i, x, sh, lt, Ws):
            return jnp.sum(field_fused(
                jnp.clip(x + i * 1e-7, 0, 1), sh, lt, Ws, tile)[3])
        r = timeit(e3, x_t, sh_t, lt, Ws, reps=8, n_items=M)
        print(json.dumps({"exp": f"field_fused_t{tile}",
                          "M_pts_s": round(r / 1e6, 1)}))

        def e3s(i, x, sh, lt, Ws):
            return jnp.sum(field_fused(
                jnp.clip(x + i * 1e-7, 0, 1), sh, lt, Ws, tile,
                with_color=False)[3])
        r = timeit(e3s, x_t, sh_t, lt, Ws, reps=8, n_items=M)
        print(json.dumps({"exp": f"field_fused_sigma_only_t{tile}",
                          "M_pts_s": round(r / 1e6, 1)}))

    # ---------------- E4: raw2outputs variants ----------------
    N, S = 16384, 128
    raw = jax.random.normal(key, (N, S, 4))
    z = jnp.cumsum(jax.random.uniform(key, (N, S)), axis=-1)
    rd = jax.random.normal(key, (N, 3))

    from gbnerf_tpu.core.render import raw2outputs

    def v1(i, raw, z, rd):
        rgb, *_ = raw2outputs(raw + i * 1e-6, z, rd, white_bkgd=True)
        return jnp.sum(rgb)
    r = timeit(v1, raw, z, rd, reps=16, n_items=N)
    print(json.dumps({"exp": "r2o_cumprod", "M_rays_s": round(r / 1e6, 3)}))

    def r2o_expsum(raw, z, rd, tri=None):
        dists = jnp.concatenate(
            [z[..., 1:] - z[..., :-1], jnp.full_like(z[..., :1], 1e10)], -1)
        dists = dists * jnp.linalg.norm(rd, axis=-1, keepdims=True)
        rgb = jax.nn.sigmoid(raw[..., :3])
        sd = jax.nn.relu(raw[..., 3]) * dists
        if tri is None:
            csum = jnp.cumsum(sd, axis=-1)
        else:
            csum = jnp.einsum("ns,st->nt", sd, tri,
                              precision=jax.lax.Precision.HIGHEST)
        trans = jnp.exp(-(csum - sd))      # exclusive
        alpha = 1.0 - jnp.exp(-sd)
        weights = alpha * trans
        rgb_map = jnp.sum(weights[..., None] * rgb, -2)
        acc = jnp.sum(weights, -1)
        depth = jnp.sum(weights * z, -1)
        return rgb_map + (1.0 - acc[..., None]), depth

    def v2(i, raw, z, rd):
        rgb, _ = r2o_expsum(raw + i * 1e-6, z, rd)
        return jnp.sum(rgb)
    r = timeit(v2, raw, z, rd, reps=16, n_items=N)
    print(json.dumps({"exp": "r2o_exp_cumsum", "M_rays_s": round(r / 1e6, 3)}))

    tri = jnp.asarray(np.tril(np.ones((S, S), np.float32)).T)  # inclusive w/ transpose: sd@tri -> cumsum
    def v3(i, raw, z, rd):
        rgb, _ = r2o_expsum(raw + i * 1e-6, z, rd, tri=tri)
        return jnp.sum(rgb)
    r = timeit(v3, raw, z, rd, reps=16, n_items=N)
    print(json.dumps({"exp": "r2o_exp_matmul", "M_rays_s": round(r / 1e6, 3)}))

    # numeric check v2 vs v1
    rgb1, *_ = raw2outputs(raw, z, rd, white_bkgd=True)
    rgb2, _ = r2o_expsum(raw, z, rd)
    rgb3, _ = r2o_expsum(raw, z, rd, tri=tri)
    print(json.dumps({
        "check": "r2o_expsum_maxerr", "err": float(jnp.max(jnp.abs(rgb1 - rgb2))),
        "err_matmul": float(jnp.max(jnp.abs(rgb1 - rgb3)))}))


if __name__ == "__main__":
    main()
