"""Trace the production stage-1 train step on TPU; summarize per-op times.

Attribution harness for the render-train hot path (the analog of
tools/prof_guidance.py for stage 2): builds make_train_step_stage1 at the
production shapes (1024 rays, 64+64 samples, CP field, clf+inp streams),
traces `--reps` dispatches with jax.profiler, and prints the per-op-kind
device self-time summary via tools/trace_summary.py.

Usage: python tools/prof_train.py [--reps 64] [--proposal] [--out DIR]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jax_trace_s1")
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--proposal", action="store_true",
                    help="use the proposal-style coarse field (bench flagship)")
    args = ap.parse_args()

    from gbnerf_tpu.config import (Config, FieldConfig, RenderConfig,
                                   TrainConfig)
    from gbnerf_tpu.train.state import create_train_state
    from gbnerf_tpu.train.step import make_train_step_stage1
    from gbnerf_tpu.utils.profiling import trace
    from trace_summary import summarize

    field = FieldConfig(no_tcnn=False, field_type="cp", cp_bound=8.0)
    if args.proposal:
        field = FieldConfig(no_tcnn=False, field_type="cp", cp_bound=8.0,
                            cp_resolutions_coarse=(17, 33, 65),
                            cp_rank_coarse=8)
    cfg = Config(field=field,
                 render=RenderConfig(N_samples=64, N_importance=64,
                                     lindisp=True, white_bkgd=True,
                                     raw_noise_std=1.0),
                 train=TrainConfig(N_rand=1024))
    state, coarse, fine = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step_stage1(cfg, coarse, fine, 1.2, 5.3)

    def bank(key, c, n=65536):
        o = jax.random.normal(key, (n, 3)) * 0.1
        d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t = jax.random.uniform(jax.random.fold_in(key, 2), (n, c))
        return {"o": o, "d": d, "target": t}

    banks = {"rgb_clf": bank(jax.random.PRNGKey(1), 3),
             "inp": bank(jax.random.PRNGKey(2), 1),
             "depth": None}

    k = jax.random.PRNGKey(3)
    state, m = step(state, banks, k)          # compile
    print("compiled, loss:", float(m["loss"]))

    with trace(args.out):
        for i in range(args.reps):
            state, m = step(state, banks, jax.random.fold_in(k, i))
        print("traced, loss:", float(m["loss"]))
    summarize(args.out, n_calls=args.reps)


if __name__ == "__main__":
    main()
