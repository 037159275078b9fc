"""Measure the Pallas backward kernel of the fused CP field on real TPU.

Three questions, at production stage-1 shapes (1024 rays x 128 fine
samples, R=257 F=80 full field; 64 coarse samples for the sigma variant):

  1. Does _kernel_bwd compile under Mosaic (dot_general lane-contraction,
     grid-accumulated outputs)?
  2. Parity on hardware vs the XLA-oracle vjp (interpret tests only prove
     CPU semantics).
  3. Time: oracle-vjp backward vs Pallas backward, plus TILE_BWD sweep.

Usage: python tools/exp_bwd.py [--tiles 1024,2048,4096]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gbnerf_tpu.ops import field_fused as ff


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


def make_inputs(key, n, R=257, F=80, sh_dim=16):
    ks = [jax.random.fold_in(key, i) for i in range(9)]
    x01 = jax.random.uniform(ks[0], (n, 3), minval=0.02, maxval=0.98)
    sh = jax.random.normal(ks[1], (n, sh_dim)) * 0.5
    ul = jax.random.normal(ks[2], (3, R, F)) * 0.3
    Ws = {
        "ws0": jax.random.normal(ks[3], (F, 64)) * 0.1,
        "ws1": jax.random.normal(ks[4], (64, 16)) * 0.1,
        "wc0": jax.random.normal(ks[5], (sh_dim + 15, 64)) * 0.1,
        "wc1": jax.random.normal(ks[6], (64, 64)) * 0.1,
        "wc2": jax.random.normal(ks[7], (64, 3)) * 0.1,
    }
    g = jax.random.normal(ks[8], (n, 4))
    return x01, sh, ul, Ws, g


def oracle_bwd(x01, sh, ul, Ws, g):
    _, vjp = jax.vjp(
        lambda x, s, u, a, b, c, d, e: ff._oracle(
            x, s, u, dict(zip(ff.W_KEYS, (a, b, c, d, e))),
            sigma_only=False),
        x01, sh, ul, *(Ws[k] for k in ff.W_KEYS))
    return vjp(g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="1024,2048,4096")
    ap.add_argument("--n", type=int, default=1024 * 128)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    key = jax.random.PRNGKey(0)
    x01, sh, ul, Ws, g = make_inputs(key, args.n)

    # -- 2. hardware parity (one call, small n)
    xs, ss, us, Wss, gs = make_inputs(jax.random.PRNGKey(1), 4096)
    ref = jax.jit(oracle_bwd)(xs, ss, us, Wss, gs)
    got = jax.jit(lambda *a: ff._pallas_bwd(
        a[0], a[1], a[2], dict(zip(ff.W_KEYS, a[3:8])), a[8],
        sigma_only=False))(xs, ss, us, *(Wss[k] for k in ff.W_KEYS), gs)
    flat_got = [got[0], got[1], got[2]] + [got[3][k] for k in ff.W_KEYS]
    errs = {}
    for name, a, b in zip(
            ("dx", "dsh", "dul") + ff.W_KEYS, flat_got, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        errs[name] = float(np.abs(a - b).max() / scale)
    print(json.dumps({"exp": "bwd_parity_tpu", "rel_errs": errs}), flush=True)
    assert max(errs.values()) < 3e-2, errs

    # -- 3a. oracle baseline
    def fn_oracle(i, x, s, u, a, b, c, d, e, gg):
        outs = oracle_bwd(x + i * 1e-7, s, u,
                          dict(zip(ff.W_KEYS, (a, b, c, d, e))), gg)
        return sum(jnp.sum(o) for o in outs)

    ms = timeit(fn_oracle, x01, sh, ul, *(Ws[k] for k in ff.W_KEYS), g)
    print(json.dumps({"exp": "bwd_oracle", "n": args.n, "ms": round(ms, 3),
                      "m_pts_s": round(args.n / ms / 1e3, 1)}), flush=True)

    # -- 3b. kernel, TILE sweep
    for tile in (int(t) for t in args.tiles.split(",")):
        def fn_kernel(i, x, s, u, a, b, c, d, e, gg, _t=tile):
            outs = ff._pallas_bwd(x + i * 1e-7, s, u,
                                  dict(zip(ff.W_KEYS, (a, b, c, d, e))), gg,
                                  sigma_only=False, tile=_t)
            return (jnp.sum(outs[0]) + jnp.sum(outs[1]) + jnp.sum(outs[2])
                    + sum(jnp.sum(v) for v in outs[3].values()))
        try:
            ms = timeit(fn_kernel, x01, sh, ul,
                        *(Ws[k] for k in ff.W_KEYS), g)
            print(json.dumps({"exp": f"bwd_kernel_t{tile}", "n": args.n,
                              "ms": round(ms, 3),
                              "m_pts_s": round(args.n / ms / 1e3, 1)}),
                  flush=True)
        except Exception as e:  # VMEM blowout etc. — record, keep sweeping
            print(json.dumps({"exp": f"bwd_kernel_t{tile}",
                              "error": str(e)[:300]}), flush=True)

    # -- 3c. sigma variant at coarse shapes
    n_c = 1024 * 64
    xc, _, ulc, Wsc, gc = make_inputs(jax.random.PRNGKey(2), n_c, R=65, F=24)
    gc = gc.at[:, :3].set(0.0)

    def fn_sig(i, x, u, a, b, gg):
        outs = ff._pallas_bwd_sigma(x + i * 1e-7, u, a, b, gg)
        return sum(jnp.sum(o) for o in outs)

    ms = timeit(fn_sig, xc, ulc, Wsc["ws0"], Wsc["ws1"], gc)
    print(json.dumps({"exp": "bwd_kernel_sigma", "n": n_c,
                      "ms": round(ms, 3),
                      "m_pts_s": round(n_c / ms / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
