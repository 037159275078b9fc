"""Component-level TPU profile of the render path + encode variants.

Times each component with the LICM-safe in-jit fori_loop method from bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R_MAX = 257
F = 80  # 5 levels x rank 16


def timeit(fn, *args, reps=16, n_items=1):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            out = fn(i, *a)
            return acc + out * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    float(timed(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return n_items * reps / best


def main():
    key = jax.random.PRNGKey(0)
    N_RAYS = 16384
    S = 64

    # ---------- full render (reference for attribution) ----------
    from gbnerf_tpu.config import Config, FieldConfig, RenderConfig
    from gbnerf_tpu.train.state import create_train_state
    from gbnerf_tpu.train.step import make_render_fn

    cfg = Config(field=FieldConfig(no_tcnn=False, field_type="cp"),
                 render=RenderConfig(N_samples=64, N_importance=64,
                                     lindisp=True, white_bkgd=True))
    state, coarse, fine = create_train_state(cfg, key)
    render = make_render_fn(cfg, coarse, fine, near=1.2, far=5.3)
    ro = jax.random.normal(key, (N_RAYS, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (N_RAYS, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    def full(i, params, ro, rd):
        out = render(params, ro + i * 1e-6, rd, None, train=False)
        return jnp.sum(out.rgb)

    r = timeit(full, state.params, ro, rd, reps=32, n_items=N_RAYS)
    print(json.dumps({"component": "full_render", "M_rays_s": round(r / 1e6, 3)}))

    # ---------- encode variants on M points ----------
    M = N_RAYS * 128  # fine-pass point count
    pts = jax.random.uniform(key, (M, 3))
    ulines = jax.random.normal(jax.random.fold_in(key, 2), (3, R_MAX, F)) * 0.1

    from gbnerf_tpu.ops.cp_pallas import _xla_impl, cp_encode_unified

    def enc_dense(i, x, ul):
        return jnp.sum(_xla_impl(jnp.clip(x + i * 1e-7, 0, 1), ul, R_MAX))

    r = timeit(enc_dense, pts, ulines, reps=8, n_items=M)
    print(json.dumps({"component": "encode_dense_xla", "M_pts_s": round(r / 1e6, 1)}))

    def enc_pallas(i, x, ul):
        return jnp.sum(cp_encode_unified(jnp.clip(x + i * 1e-7, 0, 1), ul, R_MAX))

    r = timeit(enc_pallas, pts, ulines, reps=8, n_items=M)
    print(json.dumps({"component": "encode_dense_pallas", "M_pts_s": round(r / 1e6, 1)}))

    # KR-factorized: onehot16 (x) tri17 -> [N, 272] @ [272, F]
    SEG_W = 16
    NSEG = (R_MAX - 1) // SEG_W
    idx = (np.arange(NSEG)[:, None] * SEG_W
           + np.arange(SEG_W + 1)[None, :]).reshape(-1)

    def enc_kr(i, x, ul):
        x = jnp.clip(x + i * 1e-7, 0, 1)
        lt = ul[:, idx, :].astype(jnp.bfloat16)  # [3, 272, F]
        st = jnp.arange(NSEG, dtype=jnp.float32)
        tt = jnp.arange(SEG_W + 1, dtype=jnp.float32)
        prod = None
        for a in range(3):
            u = x[:, a] * (R_MAX - 1)
            s = jnp.minimum(jnp.floor(u * (1.0 / SEG_W)), NSEG - 1)
            v = u - s * SEG_W
            oh = (st[None] == s[:, None]).astype(jnp.bfloat16)
            tri = jnp.maximum(1.0 - jnp.abs(tt[None] - v[:, None]),
                              0.0).astype(jnp.bfloat16)
            kr = (oh[:, :, None] * tri[:, None, :]).reshape(-1, NSEG * (SEG_W + 1))
            fa = jnp.dot(kr, lt[a], preferred_element_type=jnp.float32)
            prod = fa if prod is None else prod * fa
        return jnp.sum(prod)

    r = timeit(enc_kr, pts, ulines, reps=8, n_items=M)
    print(json.dumps({"component": "encode_kr_xla", "M_pts_s": round(r / 1e6, 1)}))

    # ---------- MLP heads only (sigma+color topology) ----------
    enc = jax.random.normal(key, (M, F), jnp.bfloat16)
    sh = jax.random.normal(key, (M, 25), jnp.bfloat16)
    Ws = {
        "s0": jax.random.normal(key, (F, 64), jnp.bfloat16) * 0.1,
        "s1": jax.random.normal(key, (64, 16), jnp.bfloat16) * 0.1,
        "c0": jax.random.normal(key, (40, 64), jnp.bfloat16) * 0.1,
        "c1": jax.random.normal(key, (64, 64), jnp.bfloat16) * 0.1,
        "c2": jax.random.normal(key, (64, 3), jnp.bfloat16) * 0.1,
    }

    def mlps(i, enc, sh, W):
        h = jax.nn.relu(jnp.dot(enc + i * jnp.bfloat16(1e-3), W["s0"]))
        h = jnp.dot(h, W["s1"])
        sigma, geo = h[:, :1], h[:, 1:]
        h = jnp.concatenate([sh, geo], axis=-1)
        h = jax.nn.relu(jnp.dot(h, W["c0"]))
        h = jax.nn.relu(jnp.dot(h, W["c1"]))
        rgb = jnp.dot(h, W["c2"])
        return jnp.sum(rgb.astype(jnp.float32)) + jnp.sum(sigma.astype(jnp.float32))

    r = timeit(mlps, enc, sh, Ws, reps=8, n_items=M)
    print(json.dumps({"component": "mlp_heads", "M_pts_s": round(r / 1e6, 1)}))

    # ---------- resample ops at render shapes ----------
    from gbnerf_tpu.ops.resample import merge_sorted_onehot, sample_pdf_onehot

    zm = jnp.sort(jax.random.uniform(key, (N_RAYS, S - 1)), axis=-1)
    w = jax.random.uniform(key, (N_RAYS, S - 2))

    def resamp(i, zm, w):
        z = sample_pdf_onehot(zm + i * 1e-6, w, 64, det=True)
        return jnp.sum(merge_sorted_onehot(zm, z))

    r = timeit(resamp, zm, w, reps=16, n_items=N_RAYS)
    print(json.dumps({"component": "resample+merge", "M_rays_s": round(r / 1e6, 3)}))

    # ---------- raw2outputs at render shapes ----------
    from gbnerf_tpu.core.render import raw2outputs

    raw = jax.random.normal(key, (N_RAYS, 128, 4))
    z = jnp.cumsum(jax.random.uniform(key, (N_RAYS, 128)), axis=-1)

    def r2o(i, raw, z, rd):
        rgb, disp, acc, wts, depth, alpha = raw2outputs(
            raw + i * 1e-6, z, rd, white_bkgd=True)
        return jnp.sum(rgb)

    r = timeit(r2o, raw, z, rd, reps=16, n_items=N_RAYS)
    print(json.dumps({"component": "raw2outputs_128", "M_rays_s": round(r / 1e6, 3)}))


if __name__ == "__main__":
    main()
