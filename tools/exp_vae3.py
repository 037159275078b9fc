"""Chase the VAE backward copy storm: chained convs w/ and w/o custom VJP.

Trace of the full encode fwd+bwd shows 11.2 ms/call of `copy` + 4 ms `pad`
ops — layout conversions around the BACKWARD convs. Hypothesis: expressing
the data-grad as a plain forward NHWC conv (spatially flipped kernel,
in/out channels swapped) removes the copies. The VAE is frozen in SDS, so
only input-grads matter.

  C0  chain of 8 nn.Conv 3x3 @512^2x128, standard vjp
  C1  same chain, custom-vjp conv (bwd = forward-style conv)
  C2  chain of 8 (GN->SiLU->conv) blocks, standard vjp
  C3  same, custom-vjp conv
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

DT = jnp.bfloat16
HW, CH, DEPTH = 512, 128, 8
DN = ("NHWC", "HWIO", "NHWC")


def timeit(fn, *args, reps=32):
    @jax.jit
    def timed(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, reps, body, 0.0)

    float(timed(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def _conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN)


@jax.custom_vjp
def conv_fgrad(x, w):
    return _conv(x, w)


def _conv_fwd(x, w):
    return _conv(x, w), (x, w)


def _conv_bwd(res, g):
    x, w = res
    g = g.astype(DT)
    # data-grad as a FORWARD conv: flip spatial, swap I/O channels
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = lax.conv_general_dilated(g, w_flip, (1, 1), "SAME",
                                  dimension_numbers=DN).astype(x.dtype)
    # weight-grad through the standard vjp (unused when w is frozen;
    # XLA dead-codes it)
    _, vjp = jax.vjp(lambda ww: _conv(res[0], ww), w)
    (dw,) = vjp(g)
    return dx, dw


conv_fgrad.defvjp(_conv_fwd, _conv_bwd)


def make_chain(custom: bool, gn: bool):
    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x
            for i in range(DEPTH):
                if gn:
                    h = nn.GroupNorm(num_groups=32, dtype=DT,
                                     name=f"gn{i}")(h)
                    h = nn.silu(h)
                w = self.param(f"w{i}", nn.initializers.normal(0.05),
                               (3, 3, CH, CH), DT)
                h = conv_fgrad(h, w) if custom else _conv(h, w)
            return h
    return Chain()


def bench(name, mod, x):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)["params"]

    def fb(i, p, xx):
        def f(z):
            return jnp.sum(mod.apply({"params": p}, z).astype(jnp.float32))
        l, g = jax.value_and_grad(f)(xx + i * jnp.asarray(1e-6, xx.dtype))
        return (l + jnp.sum(g.astype(jnp.float32))) * 1e-9

    def fwd(i, p, xx):
        out = mod.apply({"params": p}, xx + i * jnp.asarray(1e-6, xx.dtype))
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    tf = timeit(fwd, params, x)
    tb = timeit(fb, params, x)
    print(json.dumps({"chain": name, "fwd_ms": round(tf, 2),
                      "fwd_bwd_ms": round(tb, 2)}), flush=True)


def main():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, HW, HW, CH), DT)
    # numeric parity of the custom conv grad
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, CH, CH), DT) * 0.05
    g0 = jax.grad(lambda z: jnp.sum(_conv(z, w).astype(jnp.float32)))(x)
    g1 = jax.grad(lambda z: jnp.sum(conv_fgrad(z, w).astype(jnp.float32)))(x)
    err = float(jnp.max(jnp.abs((g0 - g1).astype(jnp.float32))))
    print(json.dumps({"check": "custom_vjp_dx_maxerr", "err": err}),
          flush=True)

    bench("C0_conv_std", make_chain(False, False), x)
    bench("C1_conv_custom", make_chain(True, False), x)
    bench("C2_gnconv_std", make_chain(False, True), x)
    bench("C3_gnconv_custom", make_chain(True, True), x)


if __name__ == "__main__" and not os.environ.get("ROUND2"):
    main()


# ---- round 2: downsample variants + channel growth ----

def make_encoder_like(pad_mode: str):
    """4-stage encoder skeleton: 2 gn-convs per stage + downsample.

    pad_mode: 'jnp_pad'  = jnp.pad + VALID stride-2 conv (production code)
              'conv_pad' = asymmetric padding inside the conv op
              'same'     = symmetric SAME stride-2 conv (not SD-parity)
    """
    chans = (128, 256, 512, 512)

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x
            for si, ch in enumerate(chans):
                for i in range(2):
                    h = nn.GroupNorm(num_groups=32, dtype=DT,
                                     name=f"gn{si}_{i}")(h)
                    h = nn.silu(h)
                    w = self.param(f"w{si}_{i}",
                                   nn.initializers.normal(0.05),
                                   (3, 3, h.shape[-1], ch), DT)
                    h = _conv(h, w)
                if si < 3:
                    wd = self.param(f"wd{si}", nn.initializers.normal(0.05),
                                    (3, 3, ch, ch), DT)
                    if pad_mode == "jnp_pad":
                        hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                        h = lax.conv_general_dilated(
                            hp, wd, (2, 2), "VALID", dimension_numbers=DN)
                    elif pad_mode == "conv_pad":
                        h = lax.conv_general_dilated(
                            h, wd, (2, 2), ((0, 1), (0, 1)),
                            dimension_numbers=DN)
                    else:
                        h = lax.conv_general_dilated(
                            h, wd, (2, 2), "SAME", dimension_numbers=DN)
            return h
    return Enc()


def main2():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 128), DT)
    for mode in ("jnp_pad", "conv_pad", "same"):
        bench(f"E_{mode}", make_encoder_like(mode), x)


if __name__ == "__main__" and os.environ.get("ROUND2"):
    main2()
