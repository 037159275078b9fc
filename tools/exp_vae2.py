"""VAE-encode backward bisection: sum of real submodules vs the whole.

exp_vae.py showed per-layer bwd/fwd ratios of 0.5-0.8, yet the full encoder
measures fwd 11.8 / fwd+bwd 50.6 ms (ratio 3.3). Times the encoder's actual
submodules at their production shapes, the whole encode, and a
checkpoint(remat)-wrapped encode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gbnerf_tpu.guidance.blocks import ResnetBlock2D, Downsample2D
from gbnerf_tpu.guidance.vae import AutoencoderKL, VAEAttention, VAEConfig

DT = jnp.bfloat16


def timeit(fn, *args, reps=64):
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


def bench_module(name, mod, x, reps=64):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)["params"]

    def fwd(i, p, xx):
        out = mod.apply({"params": p}, xx + i * jnp.asarray(1e-6, xx.dtype))
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def fb(i, p, xx):
        def f(z):
            return jnp.sum(mod.apply({"params": p}, z).astype(jnp.float32))
        l, g = jax.value_and_grad(f)(xx + i * jnp.asarray(1e-6, xx.dtype))
        return (l + jnp.sum(g.astype(jnp.float32))) * 1e-9

    tf = timeit(fwd, params, x, reps=reps)
    tb = timeit(fb, params, x, reps=reps)
    print(json.dumps({"mod": name, "fwd_ms": round(tf, 2),
                      "fwd_bwd_ms": round(tb, 2)}), flush=True)
    return tf, tb


def main():
    key = jax.random.PRNGKey(1)
    tot_f = tot_b = 0.0
    # SD1.5 VAE encoder: blocks (128,128) @512², (256,256) @256²,
    # (512,512) @128², (512,512) @64², mid resnets+attn @64².
    shapes = [(512, 128, 2), (256, 256, 2), (128, 512, 2), (64, 512, 2)]
    for hw, ch, nres in shapes:
        x = jax.random.normal(key, (1, hw, hw, ch), DT)
        f, b = bench_module(f"resnet_{hw}x{ch}", ResnetBlock2D(ch, dtype=DT),
                            x)
        tot_f += nres * f
        tot_b += nres * b
        if hw > 64:
            f, b = bench_module(f"down_{hw}x{ch}",
                                Downsample2D(ch, dtype=DT), x)
            tot_f += f
            tot_b += b
    x = jax.random.normal(key, (1, 64, 64, 512), DT)
    f, b = bench_module("mid_attn_64x512", VAEAttention(dtype=DT), x)
    tot_f += f
    tot_b += b
    f, b = bench_module("mid_resnet_64x512_x2", ResnetBlock2D(512, dtype=DT),
                        x)
    tot_f += 2 * f
    tot_b += 2 * b
    print(json.dumps({"mod": "SUM_OF_PARTS", "fwd_ms": round(tot_f, 2),
                      "fwd_bwd_ms": round(tot_b, 2)}), flush=True)

    # whole encode
    vae = AutoencoderKL(VAEConfig(), dtype=DT)
    img = jax.random.uniform(key, (1, 512, 512, 3))
    k = jax.random.PRNGKey(3)
    params = jax.jit(lambda kk, im: vae.init(kk, im, k,
                                             method=AutoencoderKL.encode)
                     )(jax.random.PRNGKey(0), img)["params"]

    def enc(p, im):
        return vae.apply({"params": p}, im, k, method=AutoencoderKL.encode)

    def fwd(i, p, im):
        return jnp.sum(enc(p, im + i * 1e-6).astype(jnp.float32)) * 1e-9

    def fb(i, p, im):
        def f(z):
            return jnp.sum(enc(p, z).astype(jnp.float32))
        l, g = jax.value_and_grad(f)(im + i * 1e-6)
        return (l + jnp.sum(g.astype(jnp.float32))) * 1e-9

    def fb_remat(i, p, im):
        def f(z):
            return jnp.sum(jax.checkpoint(enc, static_argnums=())(
                p, z).astype(jnp.float32))
        l, g = jax.value_and_grad(f)(im + i * 1e-6)
        return (l + jnp.sum(g.astype(jnp.float32))) * 1e-9

    print(json.dumps({"mod": "whole_encode", "fwd_ms":
                      round(timeit(fwd, params, img, reps=32), 2),
                      "fwd_bwd_ms":
                      round(timeit(fb, params, img, reps=32), 2)}),
          flush=True)
    print(json.dumps({"mod": "whole_encode_remat", "fwd_bwd_ms":
                      round(timeit(fb_remat, params, img, reps=32), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
