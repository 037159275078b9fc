"""Offline SD-inpainting pipeline: full multi-step denoise loop.

Parity with the reference's vendored StableDiffusionInpaintPipeline.__call__
(/root/reference/DS_NeRF/pipelines/stable_diffusion_inpainting_pipeline.py:
1272-1718) and the txt2img sanity path (sd_utils.py:725-790): prompt → 2- or
3-way embeddings (encode_prompt_csd triple, pipeline:613-830), latent/mask
prep (prepare_latents :993, prepare_mask_latents :1065), `strength`-sliced
timesteps (:1117), DDIM denoise loop with CFG each step, VAE decode.

TPU-native: the whole denoise loop is one jit (`lax.fori_loop` over steps);
the CFG copies batch on the leading axis.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sds import cfg_combine_bsd, cfg_combine_sds
from .stable import SDModules, _resize
from .vae import AutoencoderKL


def get_timesteps(num_inference_steps: int, strength: float,
                  num_train_timesteps: int = 1000) -> np.ndarray:
    """DDIM-spaced timesteps, strength-sliced (pipeline get_timesteps)."""
    step = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(int)
    init_t = min(int(num_inference_steps * strength), num_inference_steps)
    return ts[num_inference_steps - init_t:]


def inpaint(
    mods: SDModules,
    embeds: jnp.ndarray,           # [3, L, D] (null, uncond, text)
    image: jnp.ndarray,            # [H, W, 3] in [0, 1]
    mask: jnp.ndarray,             # [H, W] (1 = repaint)
    rng,
    *,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    strength: float = 1.0,
    use_csd: bool = False,
    # reference --w1/--w2/--w3 defaults (run.py:511-513)
    w1: float = 8.5, w2: float = 7.5, w3: float = 0.5,
    unet_params=None, vae_params=None,
) -> jnp.ndarray:
    """Full inpainting generation → [S, S, 3] image in [0, 1].

    unet_params/vae_params: thread the tower weights as ARGUMENTS when
    jitting this (jit of a closure over mods.*_params bakes ~3.6 GB of
    constants into the executable — same invariant as the train steps).
    """
    unet_params = mods.unet_params if unet_params is None else unet_params
    vae_params = mods.vae_params if vae_params is None else vae_params
    S, LR = mods.latent_size, mods.latent_res
    sched = mods.schedule
    k_lat, k_enc1, k_enc2 = jax.random.split(rng, 3)

    img512 = _resize(image[None], S) * 2.0 - 1.0
    mask512 = _resize(jnp.abs(mask)[None, ..., None], S)
    masked_image = img512 * (mask512 < 0.5)

    enc = lambda im, k: mods.vae.apply({"params": vae_params}, im, k,
                                       method=AutoencoderKL.encode)
    masked_latents = enc(masked_image, k_enc1)
    mask_lat = _resize(mask512, LR, method="nearest")

    ts = get_timesteps(num_inference_steps, strength,
                       sched.num_train_timesteps)
    ts = jnp.asarray(ts, jnp.int32)
    n_steps = len(ts)

    if strength >= 1.0:
        latents = jax.random.normal(k_lat, (1, LR, LR, 4))
    else:
        init_latents = enc(img512, k_enc2)
        noise = jax.random.normal(k_lat, init_latents.shape)
        latents = sched.add_noise(init_latents, noise, ts[0])

    k = 3 if use_csd else 2
    emb = embeds if use_csd else embeds[1:]

    def body(i, latents):
        t = ts[i]
        t_prev = jnp.where(i + 1 < n_steps, ts[jnp.minimum(i + 1, n_steps - 1)],
                           -1)
        lat_in = jnp.concatenate([latents] * k, axis=0)
        unet_in = jnp.concatenate(
            [lat_in,
             jnp.concatenate([mask_lat] * k, axis=0),
             jnp.concatenate([masked_latents] * k, axis=0)], axis=-1)
        eps = mods.unet.apply({"params": unet_params}, unet_in, t, emb)
        if use_csd:
            pred = cfg_combine_bsd(eps[0], eps[1], eps[2], w1, w2, w3)[None]
        else:
            pred = cfg_combine_sds(eps[0], eps[1], guidance_scale)[None]
        return sched.ddim_step(latents, pred, t, t_prev)

    latents = jax.lax.fori_loop(0, n_steps, body, latents)
    img = mods.vae.apply({"params": vae_params}, latents,
                         method=AutoencoderKL.decode)
    return jnp.clip(img[0] * 0.5 + 0.5, 0.0, 1.0)


def prompt_to_img(mods: SDModules, embeds, rng, *, steps: int = 50,
                  guidance_scale: float = 7.5) -> jnp.ndarray:
    """txt2img sanity path (sd_utils.py prompt_to_img): generation from pure
    noise through the inpainting UNet with a full repaint mask."""
    S = mods.latent_size
    blank = jnp.zeros((S, S, 3))
    full_mask = jnp.ones((S, S))
    return inpaint(mods, embeds, blank, full_mask, rng,
                   num_inference_steps=steps, guidance_scale=guidance_scale,
                   strength=1.0)
