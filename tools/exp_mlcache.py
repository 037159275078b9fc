"""Measure: is caching the masked-conditioning VAE encode worth it?

The RGB-modality masked image (composite × (mask<0.5)) equals GT outside
the mask and zero inside — a per-view constant. sd_train_step grew an
optional masked_latents= to skip its per-iteration VAE encode; this times
the full-size SD guidance step (fwd+bwd wrt the rgb input) with and
without the cache on the real chip.

Usage: python tools/exp_mlcache.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gbnerf_tpu.config import GuidanceConfig
from gbnerf_tpu.guidance.stable import (AutoencoderKL, build_sd_modules,
                                        sd_train_step)


def timeit(fn, *args, reps=16):
    jax.block_until_ready(fn(*args))
    # one scalar fetch per rep batch; dispatch pipelining hides the tunnel
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        float(outs[-1][0] if isinstance(outs[-1], tuple) else outs[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    gcfg = GuidanceConfig(sd_allow_random=True, use_csd=True)
    mods = build_sd_modules(gcfg, jax.random.PRNGKey(0))
    H, W = 378, 504
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (H, W)) > 0.7
            ).astype(jnp.float32)

    def loss_plain(r, up, vp, i):
        return sd_train_step(mods, gcfg, 500 + i * 0, r + i * 1e-6, mask,
                             jax.random.PRNGKey(5), embeds=mods.embeds_rgb,
                             guidance_scale=7.5, mode="csd",
                             unet_params=up, vae_params=vp)

    gfn = jax.jit(jax.value_and_grad(loss_plain), static_argnums=())
    ms_plain = timeit(lambda i: gfn(rgb, mods.unet_params, mods.vae_params,
                                    float(i)), 1.0)
    print(json.dumps({"exp": "guidance_step_plain", "ms": round(ms_plain, 2)}),
          flush=True)

    # precompute the cached masked latents once (what the loop would do)
    from gbnerf_tpu.guidance.stable import _resize
    S = mods.latent_size
    rgb512 = _resize(rgb[None], S) * 2.0 - 1.0
    mask512 = _resize(jnp.abs(mask)[None, ..., None], S)
    ml = mods.vae.apply({"params": mods.vae_params},
                        rgb512 * (mask512 < 0.5), jax.random.PRNGKey(7),
                        method=AutoencoderKL.encode)

    def loss_cached(r, up, vp, ml_, i):
        return sd_train_step(mods, gcfg, 500, r + i * 1e-6, mask,
                             jax.random.PRNGKey(5), embeds=mods.embeds_rgb,
                             guidance_scale=7.5, mode="csd",
                             unet_params=up, vae_params=vp,
                             masked_latents=ml_)

    gfn_c = jax.jit(jax.value_and_grad(loss_cached))
    ms_cached = timeit(lambda i: gfn_c(rgb, mods.unet_params,
                                       mods.vae_params, ml, float(i)), 1.0)
    print(json.dumps({"exp": "guidance_step_cached_ml",
                      "ms": round(ms_cached, 2),
                      "saved_ms": round(ms_plain - ms_cached, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
