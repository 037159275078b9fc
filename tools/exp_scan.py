"""Cumulative-op experiments: XLA cumsum/cumprod vs triangular-matmul (MXU).

The render hot path uses jnp.cumsum (inverse-CDF cdf, sorted-uniform order
statistics) and jnp.cumprod (transmittance). prof_field.py shows
resample+merge at 5.6 M rays/s and raw2outputs at 7.3 M rays/s standalone —
suspiciously slow for elementwise-sized work. Hypothesis: XLA lowers cum*
on TPU to serial/reduce-window forms; a [S,S]-triangular matmul at
precision=HIGHEST does the same reduction on the MXU in one pass.
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

N, S = 16384, 128


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


def cumsum_mm(x, tri):
    return jnp.dot(x, tri, precision=jax.lax.Precision.HIGHEST)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, S)) * 0.1
    tri_incl = jnp.asarray(np.triu(np.ones((S, S), np.float32)))   # x@tri -> inclusive
    tri_excl = jnp.asarray(np.triu(np.ones((S, S), np.float32), 1))

    def v_cumsum(i, x):
        return jnp.sum(jnp.cumsum(x + i * 1e-6, axis=-1))
    r = timeit(v_cumsum, x, n_items=N)
    print(json.dumps({"exp": "xla_cumsum", "M_rows_s": round(r / 1e6, 2)}), flush=True)

    def v_cumprod(i, x):
        return jnp.sum(jnp.cumprod(1.0 - x + i * 1e-6, axis=-1))
    r = timeit(v_cumprod, x, n_items=N)
    print(json.dumps({"exp": "xla_cumprod", "M_rows_s": round(r / 1e6, 2)}), flush=True)

    def v_mm(i, x):
        return jnp.sum(cumsum_mm(x + i * 1e-6, tri_incl))
    r = timeit(v_mm, x, n_items=N)
    print(json.dumps({"exp": "mm_cumsum_highest", "M_rows_s": round(r / 1e6, 2)}), flush=True)

    def v_logprod(i, x):
        lg = jnp.log(1.0 - x + i * 1e-6 + 1e-10)
        return jnp.sum(jnp.exp(cumsum_mm(lg, tri_excl)))
    r = timeit(v_logprod, x, n_items=N)
    print(json.dumps({"exp": "mm_cumprod_logspace", "M_rows_s": round(r / 1e6, 2)}), flush=True)

    # numeric parity
    cs = jnp.cumsum(x, axis=-1)
    cm = cumsum_mm(x, tri_incl)
    cp = jnp.cumprod(1.0 - x + 1e-10, axis=-1)
    cl = jnp.exp(cumsum_mm(jnp.log(1.0 - x + 1e-10), tri_incl))
    print(json.dumps({
        "check": "parity",
        "cumsum_maxerr": float(jnp.max(jnp.abs(cs - cm))),
        "cumprod_relerr": float(jnp.max(jnp.abs(cp - cl) / (cp + 1e-30))),
    }), flush=True)

    # ---------------- r2o variants at render shapes ----------------
    from gbnerf_tpu.core.render import raw2outputs

    raw = jax.random.normal(key, (N, S, 4))
    z = jnp.cumsum(jax.random.uniform(key, (N, S)), axis=-1)
    rd = jax.random.normal(key, (N, 3))

    def v1(i, raw, z, rd):
        rgb, *_ = raw2outputs(raw + i * 1e-6, z, rd, white_bkgd=True)
        return jnp.sum(rgb)
    r = timeit(v1, raw, z, rd, n_items=N)
    print(json.dumps({"exp": "r2o_current", "M_rays_s": round(r / 1e6, 3)}), flush=True)

    def r2o_mm(raw, z, rd):
        dists = jnp.concatenate(
            [z[..., 1:] - z[..., :-1], jnp.full_like(z[..., :1], 1e10)], -1)
        dists = dists * jnp.linalg.norm(rd, axis=-1, keepdims=True)
        rgb = jax.nn.sigmoid(raw[..., :3])
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)
        lg = jnp.log(1.0 - alpha + 1e-10)
        trans = jnp.exp(cumsum_mm(lg, tri_excl))
        weights = alpha * trans
        rgb_map = jnp.sum(weights[..., None] * rgb, -2)
        acc = jnp.sum(weights, -1)
        return rgb_map + (1.0 - acc[..., None]), weights

    def v2(i, raw, z, rd):
        rgb, _ = r2o_mm(raw + i * 1e-6, z, rd)
        return jnp.sum(rgb)
    r = timeit(v2, raw, z, rd, n_items=N)
    print(json.dumps({"exp": "r2o_mm_logspace", "M_rays_s": round(r / 1e6, 3)}), flush=True)

    rgb1, _, _, w1, _, _ = raw2outputs(raw, z, rd, white_bkgd=True)
    rgb2, w2 = r2o_mm(raw, z, rd)
    print(json.dumps({"check": "r2o_parity",
                      "rgb_maxerr": float(jnp.max(jnp.abs(rgb1 - rgb2))),
                      "w_maxerr": float(jnp.max(jnp.abs(w1 - w2)))}), flush=True)

    # ---------------- resample with mm-cumsum ----------------
    from gbnerf_tpu.ops.resample import (merge_sorted_fast, sample_pdf_fast,
                                         sorted_uniform)

    B = 64
    bins = jnp.sort(jax.random.uniform(key, (N, B)), axis=-1)
    w = jax.random.uniform(key, (N, B - 1))

    def rs1(i, bins, w):
        zs = sample_pdf_fast(bins + i * 1e-6, w, 64, det=True)
        return jnp.sum(merge_sorted_fast(bins, zs))
    r = timeit(rs1, bins, w, n_items=N)
    print(json.dumps({"exp": "resample_current", "M_rays_s": round(r / 1e6, 3)}), flush=True)

    trib = jnp.asarray(np.triu(np.ones((B - 1, B - 1), np.float32)))

    def sample_pdf_mm(bins, weights, n_s, eps=1e-5):
        w = weights + eps
        pdf = w / jnp.sum(w, axis=-1, keepdims=True)
        cdf = cumsum_mm(pdf, trib)
        cdf_lo = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf[..., :-1]], -1)
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_s), bins.shape[:-1] + (n_s,))
        dbins = bins[..., 1:] - bins[..., :-1]
        inv_pdf = 1.0 / jnp.maximum(pdf, 1e-12)
        frac = jnp.clip((u[..., :, None] - cdf_lo[..., None, :])
                        * inv_pdf[..., None, :], 0.0, 1.0)
        return bins[..., :1] + jnp.sum(frac * dbins[..., None, :], axis=-1)

    def rs2(i, bins, w):
        zs = sample_pdf_mm(bins + i * 1e-6, w, 64)
        return jnp.sum(merge_sorted_fast(bins, zs))
    r = timeit(rs2, bins, w, n_items=N)
    print(json.dumps({"exp": "resample_mm_cumsum", "M_rays_s": round(r / 1e6, 3)}), flush=True)

    z1 = sample_pdf_fast(bins, w, 64, det=True)
    z2 = sample_pdf_mm(bins, w, 64)
    print(json.dumps({"check": "resample_parity",
                      "maxerr": float(jnp.max(jnp.abs(z1 - z2)))}), flush=True)

    # merge alone
    zs = sample_pdf_fast(bins, w, 64, det=True)

    def mg(i, a, b):
        return jnp.sum(merge_sorted_fast(a + i * 1e-6, b))
    r = timeit(mg, bins, zs, n_items=N)
    print(json.dumps({"exp": "merge_alone", "M_rays_s": round(r / 1e6, 3)}), flush=True)


if __name__ == "__main__":
    main()
