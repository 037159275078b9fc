"""Measure render throughput with a proposal-style (smaller) coarse CP field.

The coarse pass only shapes importance sampling (σ-only at eval since the
sh-free kernel landed); its cost scales with R_max via the triangle masks.
Candidates vs the full-size coarse (17,33,65,129,257 r16):

  P0  full-size coarse (bench flagship today)
  P1  (17,33,65) r16
  P2  (17,33,65) r8
  P3  (17,33)    r8
  P4  (17,33,65,129) r8
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gbnerf_tpu.config import Config, FieldConfig, RenderConfig
from gbnerf_tpu.train.state import create_train_state
from gbnerf_tpu.train.step import make_render_fn

N, REPS = 16384, 128

VARIANTS = {
    "P0_full": (None, None),
    "P1_65_r16": ((17, 33, 65), 16),
    "P2_65_r8": ((17, 33, 65), 8),
    "P3_33_r8": ((17, 33), 8),
    "P4_129_r8": ((17, 33, 65, 129), 8),
}


def measure(res, rank):
    cfg = Config(
        field=FieldConfig(no_tcnn=False, field_type="cp",
                          cp_resolutions_coarse=res, cp_rank_coarse=rank),
        render=RenderConfig(N_samples=64, N_importance=64, lindisp=True,
                            white_bkgd=True),
    )
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    render = make_render_fn(cfg, coarse, fine, near=1.2, far=5.3)
    k = jax.random.PRNGKey(1)
    ro = jax.random.normal(k, (N, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    @jax.jit
    def timed(params, ro, rd):
        def body(i, acc):
            out = render(params, ro + i * 1e-6, rd, None, train=False)
            return acc + jnp.sum(out.rgb) * 1e-9
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    float(timed(state.params, ro, rd))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(state.params, ro, rd))
        best = min(best, time.perf_counter() - t0)
    return N * REPS / best


if __name__ == "__main__":
    for name, (res, rank) in VARIANTS.items():
        rps = measure(res, rank)
        print(json.dumps({"variant": name, "rays_per_sec": round(rps)}),
              flush=True)
