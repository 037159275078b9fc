"""E16: two-hot + diff-line fused field kernel vs triangle baseline."""
import functools, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_MAX, F = 257, 80

def timeit(fn, *args, reps=8, n_items=1):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            return acc + fn(i, *a) * 1e-9
        return jax.lax.fori_loop(0, reps, body, 0.0)
    float(timed(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return n_items * reps / best

def _kernel_twohot(x_ref, sh_ref, ld_ref, ws0_ref, ws1_ref, wc0_ref, wc1_ref,
                   wc2_ref, out_ref, *, r_max, with_color):
    tile = x_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_max, tile), 0)
    prod = None
    for axis in range(3):
        u = jnp.clip(x_ref[axis, :], 0.0, 1.0) * (r_max - 1)
        i0 = jnp.floor(u)
        f = (u - i0).astype(jnp.float32)
        # select into f32 (mask tiling matches), then cast: Mosaic cannot
        # relayout an (8,128) i1 mask onto a (16,128) bf16 select.
        oh = jnp.where(pos == i0[None, :].astype(jnp.int32),
                       1.0, 0.0).astype(jnp.bfloat16)
        m = jnp.dot(ld_ref[axis], oh, preferred_element_type=jnp.float32)  # [2F, tile]
        fa = m[:F, :] + f[None, :] * m[F:, :]
        prod = fa if prod is None else prod * fa
    h = jnp.maximum(jnp.dot(ws0_ref[:], prod.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32), 0.0)
    h = jnp.dot(ws1_ref[:], h.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    sigma = h[:1, :]
    if with_color:
        hc = jnp.concatenate([sh_ref[:], h[1:, :].astype(jnp.bfloat16)], axis=0)
        h = jnp.maximum(jnp.dot(wc0_ref[:], hc, preferred_element_type=jnp.float32), 0.0)
        h = jnp.maximum(jnp.dot(wc1_ref[:], h.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), 0.0)
        rgb = jnp.dot(wc2_ref[:], h.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out_ref[:] = jnp.concatenate([rgb, sigma], axis=0)
    else:
        out_ref[:] = jnp.concatenate([jnp.zeros((3, tile), jnp.float32), sigma], 0)

def field_twohot(x_t, sh_t, ld, Ws, tile, with_color=True):
    n = x_t.shape[1]
    const = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_twohot, r_max=R_MAX, with_color=with_color),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * F, R_MAX), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 64), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 31), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 64), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
    )(x_t, sh_t, ld, Ws["s0"], Ws["s1"], Ws["c0"], Ws["c1"], Ws["c2"])

def main():
    key = jax.random.PRNGKey(0)
    M = 16384 * 128
    x_t = jax.random.uniform(key, (3, M))
    sh_t = jax.random.normal(jax.random.fold_in(key, 1), (16, M), jnp.bfloat16)
    ulines = jax.random.normal(jax.random.fold_in(key, 2), (3, R_MAX, F)) * 0.1
    # ld = [L | D] transposed: [3, 2F, R]
    D = jnp.concatenate([ulines[:, 1:] - ulines[:, :-1],
                         jnp.zeros_like(ulines[:, :1])], axis=1)
    ld = jnp.concatenate([jnp.transpose(ulines, (0, 2, 1)),
                          jnp.transpose(D, (0, 2, 1))], axis=1).astype(jnp.bfloat16)
    Ws = {k: jax.random.normal(key, s, jnp.bfloat16) * 0.1 for k, s in
          [("s0", (64, F)), ("s1", (16, 64)), ("c0", (64, 31)),
           ("c1", (64, 64)), ("c2", (3, 64))]}

    # correctness vs XLA oracle (full field)
    from gbnerf_tpu.ops.field_fused import _oracle
    WsT = {"ws0": Ws["s0"].T, "ws1": Ws["s1"].T, "wc0": Ws["c0"].T,
           "wc1": Ws["c1"].T, "wc2": Ws["c2"].T}
    small_n = 4096
    ref = _oracle(x_t[:, :small_n].T, sh_t[:, :small_n].T.astype(jnp.float32),
                  ulines, WsT, sigma_only=False)
    got = field_twohot(x_t[:, :small_n], sh_t[:, :small_n], ld, Ws, 1024).T
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"check": "twohot_vs_oracle_maxerr", "err": err,
                      "scale": float(jnp.max(jnp.abs(ref)))}))

    for tile in (1024, 2048):
        def e(i, x, sh, ld, Ws):
            return jnp.sum(field_twohot(jnp.clip(x + i * 1e-7, 0, 1), sh, ld, Ws, tile)[3])
        r = timeit(e, x_t, sh_t, ld, Ws, reps=8, n_items=M)
        print(json.dumps({"exp": f"field_twohot_t{tile}", "M_pts_s": round(r / 1e6, 1)}))

    # triangle baseline at tile 2048 (untested before)
    from gbnerf_tpu.ops.field_fused import _kernel as tri_kernel, TILE
    import gbnerf_tpu.ops.field_fused as ff
    lt = jnp.transpose(ulines, (0, 2, 1)).astype(jnp.bfloat16)
    def field_tri(x_t, sh_t, lt, Ws, tile):
        n = x_t.shape[1]
        const = lambda i: (0, 0)
        return pl.pallas_call(
            functools.partial(tri_kernel, r_max=R_MAX, sigma_only=False),
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, F, R_MAX), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, F), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 64), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 31), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 64), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 64), const, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
        )(x_t, sh_t, lt, Ws["s0"], Ws["s1"], Ws["c0"], Ws["c1"], Ws["c2"])
    for tile in (2048,):
        def e(i, x, sh, lt, Ws):
            return jnp.sum(field_tri(jnp.clip(x + i * 1e-7, 0, 1), sh, lt, Ws, tile)[3])
        r = timeit(e, x_t, sh_t, lt, Ws, reps=8, n_items=M)
        print(json.dumps({"exp": f"field_tri_t{tile}", "M_pts_s": round(r / 1e6, 1)}))

if __name__ == "__main__":
    main()
