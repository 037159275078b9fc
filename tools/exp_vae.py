"""Why is the VAE-encode backward 3.3x its forward on v5e?

prof_guidance.py: encode fwd 11.8 ms, fwd+bwd 50.6 ms. A conv data-grad
is itself a conv (same FLOPs), so fwd+bwd should be ~2x fwd. Suspects:
GroupNorm backward (HBM-bound reductions at 512^2), the stride-2
downsample data-grads (dilated conv lowering), or the attention block.
Times fwd and fwd+bwd (grad wrt INPUT, params frozen) per layer type.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

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


def bench_module(name, mod, x):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)["params"]

    def fwd(i, p, xx):
        out = mod.apply({"params": p}, xx + i * jnp.asarray(1e-6, xx.dtype))
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def fb(i, p, xx):
        def f(z):
            out = mod.apply({"params": p}, z)
            return jnp.sum(out.astype(jnp.float32))
        l, g = jax.value_and_grad(f)(xx + i * jnp.asarray(1e-6, xx.dtype))
        return (l + jnp.sum(g.astype(jnp.float32))) * 1e-9

    tf = timeit(fwd, params, x)
    tb = timeit(fb, params, x)
    print(json.dumps({"layer": name, "fwd_ms": round(tf, 2),
                      "fwd_bwd_ms": round(tb, 2),
                      "bwd_over_fwd": round((tb - tf) / max(tf, 1e-9), 2)}),
          flush=True)


class ConvOnly(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                       padding=1, dtype=DT)(x)


class GNOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, dtype=DT)(x)


class GNSiLUConv(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, dtype=DT)(x)
        h = nn.silu(h)
        return nn.Conv(self.ch, (3, 3), padding=1, dtype=DT)(h)


def main():
    key = jax.random.PRNGKey(1)
    for hw, ch in ((512, 128), (256, 256), (128, 512)):
        x = jax.random.normal(key, (1, hw, hw, ch), DT)
        bench_module(f"conv3x3_{hw}x{ch}", ConvOnly(ch), x)
        bench_module(f"conv3x3_s2_{hw}x{ch}", ConvOnly(ch, stride=2), x)
        bench_module(f"groupnorm_{hw}x{ch}", GNOnly(), x)
        bench_module(f"gn_silu_conv_{hw}x{ch}", GNSiLUConv(ch), x)

if __name__ == "__main__":
    main()
