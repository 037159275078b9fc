"""Component attribution of the flagship render at production shapes.

Times each hot component standalone with the 128-rep LICM-safe in-jit
harness (so the ~27 ms dispatch overhead is <4%), then the full render.
Sum-of-parts vs whole exposes glue/fusion effects.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N = 16384
REPS = 128


def timeit(fn, *args, reps=REPS):
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
    return best / reps * 1e3  # ms per iteration


def main():
    from gbnerf_tpu.config import Config, FieldConfig, RenderConfig
    from gbnerf_tpu.train.state import create_train_state
    from gbnerf_tpu.train.step import make_render_fn
    from gbnerf_tpu.core.cp_field import CPGridField
    from gbnerf_tpu.ops.field_fused import cp_field_fused
    from gbnerf_tpu.ops.resample import (sample_pdf_fast, merge_sorted_fast,
                                         sorted_uniform)
    from gbnerf_tpu.core.render import raw2outputs

    key = jax.random.PRNGKey(0)
    results = {}

    # --- full render (flagship bench config) ---
    cfg = Config(
        field=FieldConfig(no_tcnn=False, field_type="cp",
                          cp_resolutions_coarse=(17, 33, 65),
                          cp_rank_coarse=8),
        render=RenderConfig(N_samples=64, N_importance=64, lindisp=True,
                            white_bkgd=True),
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    render = make_render_fn(cfg, coarse, fine, near=1.2, far=5.3)
    ro = jax.random.normal(key, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    results["full_render"] = timeit(
        lambda i, p, o, d: jnp.sum(
            render(p, o + i * 1e-6, d, None, train=False).rgb),
        state.params, ro, rd)

    # --- fine field kernel at [N*128] ---
    fparams = state.params["fine"]
    model = fine
    ul = model.apply({"params": fparams}, method=model.unified_lines) \
        if hasattr(model, "unified_lines") else None
    # go through the module's public apply instead: points+dirs forward
    pts = jax.random.uniform(jax.random.fold_in(key, 2), (N * 128, 3)) * 2 - 1
    dirs = jnp.tile(rd, (128, 1))[: N * 128]

    def fine_field(i, p, x, v):
        raw = model.apply({"params": p}, x + i * 1e-6, v)
        return jnp.sum(raw[..., 3])

    results["fine_field_128smp"] = timeit(fine_field, fparams, pts, dirs)

    # --- coarse (proposal) field sigma-only at [N*64] ---
    cparams = state.params["coarse"]
    ptsc = pts[: N * 64]

    def coarse_field(i, p, x):
        raw = coarse.apply({"params": p}, x + i * 1e-6, None,
                           sigma_only=True)
        return jnp.sum(raw[..., 3])

    results["coarse_sigma_64smp"] = timeit(coarse_field, cparams, ptsc)

    # --- resample: sample_pdf_fast 64 -> 64 ---
    bins = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 3), (N, 65)),
                    axis=-1)
    w = jax.random.uniform(jax.random.fold_in(key, 4), (N, 64))

    def resample(i, b, ww):
        return jnp.sum(sample_pdf_fast(b + i * 1e-6, ww, 64, det=True))

    results["sample_pdf_64"] = timeit(resample, bins, w)

    # --- merge 64+64 ---
    a = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 5), (N, 64)), -1)
    b = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 6), (N, 64)), -1)

    def merge(i, x, y):
        return jnp.sum(merge_sorted_fast(x + i * 1e-6, y))

    results["merge_64_64"] = timeit(merge, a, b)

    # --- raw2outputs at [N,128,4] ---
    raw = jax.random.normal(jax.random.fold_in(key, 7), (N, 128, 4))
    z = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 8), (N, 128)), -1)

    def r2o(i, rr, zz, dd):
        out = raw2outputs(rr + i * 1e-6, zz, dd)
        return jnp.sum(out[0])

    results["raw2outputs_128"] = timeit(r2o, raw, z, rd)

    overhead = timeit(lambda i, x: jnp.sum(x) + i * 1e-6, ro)
    results["empty_loop_floor"] = overhead

    for k, v in results.items():
        print(json.dumps({"component": k, "ms_per_iter": round(v, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
