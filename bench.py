#!/usr/bin/env python
"""Render-throughput benchmark: rays/sec/chip on the flagship render path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the repo target of 2M rays/sec/chip rendering (BASELINE.md) at the
reference workload shape: coarse/fine field, 64 coarse + 64 importance
samples per ray (aconfig_1.txt:33-34).

Timing method: the repetition loop lives INSIDE one jit (lax.fori_loop),
each iteration renders a LOOP-VARIANT input (i-dependent ray offset), and the
program returns one scalar. All three choices are load-bearing on the
axon-tunneled TPU: ``block_until_ready`` does not await execution, host
transfers run ~30 MB/s (so per-call host timing measures the tunnel), and a
loop-invariant body gets hoisted out of the fori_loop by XLA (LICM), silently
measuring ONE render instead of N.

Flagship = the TPU-native CP-factorized grid field (interpolation as
two-hot/triangle matmuls on the MXU — core/cp_field.py, fused Pallas kernel
ops/field_fused.py) with gather-free inverse-CDF resampling (ops/resample.py)
and MXU triangular-matmul cumulative ops (ops/scan.py). Honest (LICM-safe)
history on v5e at this workload: hash-grid (tcnn parity) ≈0.01 → MLP bf16
0.28 → unified CP grid 1.29 → fused field kernel 2.17 → sort-merge +
matmul-cumsum/cumprod + amortized dispatch 3.16 → proposal-style coarse
field + split-lane-halves kernel 3.70 → Pallas bitonic-merge kernel
3.90 M rays/s.
"""
from __future__ import annotations

import json
import time

BASELINE_RAYS_PER_SEC = 2_000_000.0


def main():
    import jax
    import jax.numpy as jnp
    from gbnerf_tpu.config import Config, FieldConfig, RenderConfig
    from gbnerf_tpu.train.state import create_train_state
    from gbnerf_tpu.train.step import make_render_fn

    cfg = Config(
        # Flagship: the TPU-native CP-grid field (two-hot/triangle matmul
        # interpolation, core/cp_field.py) with gather-free resampling.
        # Proposal-style coarse field: the coarse pass only shapes importance
        # sampling, so a (17,33,65) r8 grid suffices — held-out PSNR measured
        # identical to the full-size coarse (21.30 vs 21.29 dB @1k iters,
        # tools/exp_proposal.py + /tmp cp_base/cp_prop runs), +19% throughput.
        field=FieldConfig(no_tcnn=False, field_type="cp",
                          cp_resolutions_coarse=(17, 33, 65),
                          cp_rank_coarse=8),
        render=RenderConfig(N_samples=64, N_importance=64, lindisp=True,
                            white_bkgd=True),
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    render = make_render_fn(cfg, coarse, fine, near=1.2, far=5.3)

    # reps amortize the ~27 ms fixed per-dispatch overhead of the axon
    # tunnel (measured: a trivial jit call costs ~27 ms wall regardless of
    # content); at 128 reps it is <4% of the measurement.
    n, reps = 16384, 128
    k = jax.random.PRNGKey(1)
    rays_o = jax.random.normal(k, (n, 3)) * 0.1
    rays_d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    @jax.jit
    def timed(params, ro, rd):
        def body(i, acc):
            # i-dependent input defeats loop-invariant code motion
            out = render(params, ro + i * 1e-6, rd, None, train=False)
            return acc + jnp.sum(out.rgb) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)

    float(timed(state.params, rays_o, rays_d))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(state.params, rays_o, rays_d))  # scalar fetch = hard sync
        best = min(best, time.perf_counter() - t0)

    rays_per_sec = n * reps / best
    print(json.dumps({
        "metric": "render_throughput",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec/chip",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
