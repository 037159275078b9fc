"""Stable-Diffusion-inpainting guidance: the reference's StableDiffusion +
Pretrain_Model pair, rebuilt as pure-functional jit-safe closures.

Parity targets:
  - StableDiffusion (sd_utils.py:53-790): load SD-inpaint UNet/VAE/text
    (+LoRA), precompute prompt embeddings, per-step train_step_sd /
    train_step_sd_normal / train_step_colla_sds.
  - Pretrain_Model (nerf/utils.py:174-319): guidance dict, per-modality
    scales and start iters, dispatch in cal_loss.

Divergence, documented: the reference re-tokenizes and re-encodes the prompt
every iteration (sd_utils.py:383-406) — pure overhead, the prompt never
changes. We encode once at build time and bake the embeddings into the jit as
constants. The reference's StableDiffusion.__init__ positional-arg shift
(run.py:1207, SURVEY.md §7) silently dropped model_path; we implement the
intent (LoRA loads when given).

TPU notes: everything inside `make_guidance_fn` is traced into the caller's
train-step jit — the UNet forward batches the CFG copies on the leading axis
and runs stop-gradiented; only the VAE encoder participates in the backward.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import GuidanceConfig
from .schedule import DiffusionSchedule
from .sds import (cfg_combine_bsd, cfg_combine_colla, cfg_combine_sds,
                  inject_gradient, score_distillation_grad)
from .text import CLIPTextConfig, CLIPTextEncoder, Tokenizer
from .unet import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig

LATENT_SIZE = 512  # the reference resizes every render to 512² (sd_utils.py:344)


@dataclass
class SDModules:
    """Models + params + precomputed embeddings for the guidance stack."""

    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    schedule: DiffusionSchedule
    # [3, L, D]: (null, uncond, text) embeddings for the RGB prompt
    embeds_rgb: jnp.ndarray
    # [3, L, D]: same triple for the normal-map prompt
    embeds_normal: jnp.ndarray
    # direction-suffixed prompt embeds {front, side, back} ([L, D] each)
    # for Perp-Neg azimuth conditioning; None unless gcfg.perpneg.
    embeds_dir: Optional[dict] = None
    latent_size: int = LATENT_SIZE
    # The text tower the embeds came from (module, params, tokenizer).
    # Exposed so offline consumers (train_lora.py --train_text_encoder)
    # train adapters against the SAME base the guidance merge will use —
    # a fresh init there would produce deltas for a different W.
    text_model: Any = None
    text_params: Any = None
    tokenizer: Any = None

    @property
    def latent_res(self) -> int:
        return self.latent_size // 8


def build_sd_modules(
    gcfg: GuidanceConfig,
    rng,
    *,
    unet_config: Optional[UNetConfig] = None,
    vae_config: Optional[VAEConfig] = None,
    text_config: Optional[CLIPTextConfig] = None,
    weights_dir: Optional[str] = None,
    latent_size: int = LATENT_SIZE,
    dtype=jnp.bfloat16,
) -> SDModules:
    """Init (or load) the SD-inpainting stack and precompute prompt embeds.

    weights_dir: local diffusers-layout checkpoint dir (no network here);
    when absent, models are randomly initialized — the full pipeline stays
    runnable for tests/integration, quality needs real weights.
    """
    # sd_version selects the prior architecture (reference sd_utils.py
    # maps it to an HF repo id). Only the SD1.x-inpaint topology is
    # implemented (the shipped GB-NeRF config uses the runwayml 1.5
    # inpaint checkpoint); fail loudly on 2.x rather than mis-mapping
    # weights onto a different attention/text-width layout.
    ver = getattr(gcfg, "sd_version", "1.5") or "1.5"
    if str(ver).startswith("2"):
        raise NotImplementedError(
            f"sd_version={ver!r}: only the SD1.x-inpaint architecture is "
            "implemented (UNet 320/640/1280, CLIP ViT-L text width 768). "
            "Divergence, documented: the reference's own 2.x mapping is "
            "dead code — sd_utils.py:65-72 maps the version strings, but "
            "the live load hard-codes the runwayml 1.5-inpaint checkpoint "
            "(sd_utils.py:93), so no 2.x path ever ran there either. Use "
            "sd_version=1.5 with an SD1.x-inpaint checkpoint.")

    ucfg = unet_config or UNetConfig.sd15_inpaint()
    vcfg = vae_config or VAEConfig()
    tcfg = text_config or CLIPTextConfig()

    # All inits jitted: eager flax init dispatches thousands of tiny ops,
    # which is pathological through the tunneled TPU runtime.
    k1, k2, k3 = jax.random.split(rng, 3)
    unet = UNet2DCondition(ucfg, dtype=dtype)
    lr = latent_size // 8
    unet_params = jax.jit(unet.init)(
        k1, jnp.zeros((1, lr, lr, ucfg.in_channels)), jnp.zeros(()),
        jnp.zeros((1, tcfg.max_length, ucfg.cross_attention_dim)))["params"]

    vae = AutoencoderKL(vcfg, dtype=dtype)
    vae_params = jax.jit(vae.init)(k2, jnp.zeros((1, 64, 64, 3)))["params"]

    text_model = CLIPTextEncoder(tcfg, dtype=jnp.float32)
    tok_dir = weights_dir and os.path.join(weights_dir, "tokenizer")
    if tok_dir and not os.path.isdir(tok_dir):
        # Missing vocab assets → hash-id fallback, announced LOUDLY (fine
        # for random/fake-weight runs; real checkpoints ship tokenizer/ and
        # a real-weights run must never silently distill garbage prompts —
        # Tokenizer raises if a PRESENT vocab dir fails to load).
        print(f"[text] WARNING: {weights_dir} has no tokenizer/ dir — "
              "prompts use the deterministic hash fallback, NOT real CLIP "
              "BPE. Do not use this for a real-weights run.")
        tok_dir = None
    tok = Tokenizer(tok_dir, max_length=tcfg.max_length,
                    vocab_size=tcfg.vocab_size)
    text_params = jax.jit(text_model.init)(
        k3, jnp.zeros((1, tcfg.max_length), jnp.int32))["params"]

    if weights_dir:
        from .weights import load_sd_weights

        unet_params, vae_params, text_params = load_sd_weights(
            weights_dir, unet_params, vae_params, text_params,
            lora_dir=gcfg.model_path, lora_rank=gcfg.lora_rank)

    if gcfg.sd_lora_ckpt and not gcfg.sd_prior_ckpt:
        # Native flax adapters from train_lora.py, merged BEFORE the prompt
        # embeds are computed so text-encoder adapters take effect. The
        # prior-ckpt flow merges later instead (train/loop.py) because
        # load_prior_ckpt replaces the UNet params after this point.
        from .lora import merge_lora_strict, split_adapters

        unet_ad, text_ad = split_adapters(gcfg.sd_lora_ckpt)
        unet_params = merge_lora_strict(unet_params, unet_ad, what="unet",
                                        source=gcfg.sd_lora_ckpt)
        if text_ad is not None:
            text_params = merge_lora_strict(text_params, text_ad,
                                            what="text encoder",
                                            source=gcfg.sd_lora_ckpt)
        print(f"[guidance] merged flax LoRA adapters from "
              f"{gcfg.sd_lora_ckpt}"
              + (" (unet+text)" if text_ad is not None else " (unet)"))

    text_apply = jax.jit(text_model.apply)

    def encode_triple(prompt: str, negative: str) -> jnp.ndarray:
        ids = tok(["", negative, prompt])  # (null, uncond, text)
        return text_apply({"params": text_params}, jnp.asarray(ids))

    embeds_rgb = encode_triple(gcfg.prompt, gcfg.negative_prompt)
    embeds_normal = encode_triple(gcfg.prompt_normal or gcfg.prompt,
                                  gcfg.negative_prompt)

    embeds_dir = None
    if gcfg.perpneg:
        # direction-suffixed prompts (stable-dreamfusion convention; the
        # reference sketches this at nerf/utils.py:206-208, commented out)
        ids = tok([f"{gcfg.prompt}, {d} view"
                   for d in ("front", "side", "back")])
        z = text_apply({"params": text_params}, jnp.asarray(ids))
        embeds_dir = {"front": z[0], "side": z[1], "back": z[2]}

    return SDModules(unet=unet, unet_params=unet_params, vae=vae,
                     vae_params=vae_params,
                     schedule=DiffusionSchedule.sd_v1(),
                     embeds_rgb=embeds_rgb, embeds_normal=embeds_normal,
                     embeds_dir=embeds_dir, latent_size=latent_size,
                     text_model=text_model, text_params=text_params,
                     tokenizer=tok)


def _resize(img, size: int, method: str = "bilinear"):
    """[B, H, W, C] → [B, size, size, C]."""
    return jax.image.resize(
        img, (img.shape[0], size, size) + img.shape[3:], method=method)


def _gate_negative(embeds, gate_step, use_negative: int):
    """Delayed negative-prompt gate (sd_utils.py:354-357, :175, :550):
    until GLOBAL iteration i > use_negative the uncond slot is the null
    ("") embedding — the reference passes negative_prompt=None, which
    diffusers encodes as "". embeds is the [3, L, D] (null, uncond, text)
    triple; gate_step is the reference's global i (NOT the normal
    modality's anneal-shifted step). Our step counter is 0-based while the
    reference's i is 1-based (run.py:1230 start = start + 1), so the
    reference's `i > use_negative` is `step + 1 > use_negative` here."""
    gate = jnp.asarray(gate_step)
    e_unc = jnp.where(gate + 1 > use_negative, embeds[1], embeds[0])
    return jnp.stack([embeds[0], e_unc, embeds[2]])


def sd_train_step(mods: SDModules, gcfg: GuidanceConfig, step_i, rgb, mask,
                  rng, *, embeds, guidance_scale: float,
                  mode: Optional[str] = None, w_triple=None, gate_step=None,
                  unet_params=None, vae_params=None, masked_latents=None):
    """One score-distillation step on an image modality → scalar loss.

    Mirrors train_step_sd (sd_utils.py:338-523): resize to 512², VAE-encode
    init + masked image, add noise at the annealed t, one UNet forward on the
    9-ch input with CFG copies, combine, inject masked gradient.

    Args:
      rgb: [H, W, 3] differentiable render composite in [0, 1].
      mask: [H, W] inpaint mask (1 = masked).
      embeds: [3, L, D] (null, uncond, text).
      mode: "csd" | "sds" (default from gcfg.use_csd).
      w_triple: (w1, w2, w3) for the 3-way combine — the caller threads the
        per-modality triple (nerf/utils.py:294 rgb_w*, :310 normal_w*);
        None falls back to the shared gcfg.w1/w2/w3 (the reference's
        is_crop/colla fallback).
      gate_step: global iteration for the use_negative gate; defaults to
        step_i (callers that shift step_i for the anneal — the normal
        modality — must pass the unshifted iteration here).
      masked_latents: optional precomputed [1, LR, LR, 4] VAE encoding of
        the masked conditioning image. For the RGB modality the composite
        equals GT outside the mask and the masked image zeroes the inside,
        so this is a PER-VIEW CONSTANT (up to resize bleed in a ≤2 px
        boundary band) — callers may encode it once per view instead of
        per iteration (one full-size VAE encode saved per step).
    """
    S, LR = mods.latent_size, mods.latent_res
    sched = mods.schedule
    mode = mode or ("csd" if gcfg.use_csd else "sds")
    if w_triple is None:
        w_triple = (gcfg.w1, gcfg.w2, gcfg.w3)
    embeds = _gate_negative(
        embeds, step_i if gate_step is None else gate_step,
        gcfg.use_negative)
    unet_params = mods.unet_params if unet_params is None else unet_params
    vae_params = mods.vae_params if vae_params is None else vae_params
    k_noise, k_enc1, k_enc2 = jax.random.split(rng, 3)

    rgb512 = _resize(rgb[None], S) * 2.0 - 1.0               # [1,S,S,3]
    mask512 = _resize(jnp.abs(mask)[None, ..., None], S)      # [1,S,S,1]

    vae_apply = lambda img, k: mods.vae.apply(
        {"params": vae_params}, img, k, method=AutoencoderKL.encode)
    # Differentiable path: render → init latents.
    init_latents = vae_apply(rgb512, k_enc1)                  # [1,LR,LR,4]
    if masked_latents is None:
        masked_image = rgb512 * (mask512 < 0.5)
        masked_latents = jax.lax.stop_gradient(
            vae_apply(masked_image, k_enc2))
    mask_latent = _resize(mask512, LR, method="nearest")      # [1,LR,LR,1]

    t = sched.annealed_t(step_i, gcfg.t_range, gcfg.anneal_iters)
    noise = jax.random.normal(k_noise, init_latents.shape)
    latents_t = sched.add_noise(init_latents, noise, t)

    k = 3 if mode == "csd" else 2
    lat_in = jnp.concatenate([latents_t] * k, axis=0)
    unet_in = jnp.concatenate(
        [lat_in,
         jnp.concatenate([mask_latent] * k, axis=0),
         jnp.concatenate([masked_latents] * k, axis=0)], axis=-1)
    emb = embeds if k == 3 else embeds[1:]                    # (u, t) for 2-way

    eps = mods.unet.apply({"params": unet_params},
                          jax.lax.stop_gradient(unet_in), t, emb)
    eps = jax.lax.stop_gradient(eps)

    if mode == "csd":
        e_null, e_unc, e_txt = eps[0], eps[1], eps[2]
        pred = cfg_combine_bsd(e_null, e_unc, e_txt, *w_triple)
    else:
        pred = cfg_combine_sds(eps[0], eps[1], guidance_scale)

    grad = score_distillation_grad(pred[None], noise, sched.sds_weight(t),
                                   mode=mode)
    return gcfg.lambda_guidance * inject_gradient(latents_t, grad,
                                                  mask_latent)


def sd_train_step_colla(mods: SDModules, gcfg: GuidanceConfig, step_i,
                        rgbs, masks, rng, *, unet_params=None,
                        vae_params=None, embeds=None):
    """Collaborative SDS over K neighbor views (train_step_colla_sds,
    sd_utils.py:525-724): under use_csd the per-view 3-way combine
    w1·ε_text + (w2−w1)·ε_null − w2·ε_uncond (:688-690, shared w1/w2),
    otherwise 2-way CFG at colla_guidance_scale (:691-693) with the
    TEXTBOOK grad w·(ε̂−ε) (:697-699 — the colla step's SDS grad form
    DIFFERS from train_step_sd's reference-exact w·ε̂−ε at :503-505).
    Losses sum over views.

    Args:
      rgbs: [K, H, W, 3] rendered neighbor views in [0, 1].
      masks: [K, H, W] per-view inpaint masks.
    """
    S, LR = mods.latent_size, mods.latent_res
    sched = mods.schedule
    K = rgbs.shape[0]
    mode = "csd" if gcfg.use_csd else "sds"
    nc = 3 if mode == "csd" else 2                # CFG copies (:667-671)
    unet_params = mods.unet_params if unet_params is None else unet_params
    vae_params = mods.vae_params if vae_params is None else vae_params
    embeds = mods.embeds_rgb if embeds is None else embeds
    embeds = _gate_negative(embeds, step_i, gcfg.use_negative)  # :550
    k_noise, k_enc1, k_enc2 = jax.random.split(rng, 3)

    rgb512 = _resize(rgbs, S) * 2.0 - 1.0                    # [K,S,S,3]
    mask512 = _resize(jnp.abs(masks)[..., None], S)          # [K,S,S,1]
    masked_image = rgb512 * (mask512 < 0.5)

    vae_apply = lambda img, k: mods.vae.apply(
        {"params": vae_params}, img, k, method=AutoencoderKL.encode)
    init_latents = vae_apply(rgb512, k_enc1)                 # [K,LR,LR,4]
    masked_latents = jax.lax.stop_gradient(vae_apply(masked_image, k_enc2))
    mask_latent = _resize(mask512, LR, method="nearest")

    t = sched.annealed_t(step_i, gcfg.t_range, gcfg.anneal_iters)
    noise = jax.random.normal(k_noise, init_latents.shape)
    latents_t = sched.add_noise(init_latents, noise, t)

    # [nc·K]: (null×K,) uncond×K, text×K
    lat_in = jnp.concatenate([latents_t] * nc, axis=0)
    unet_in = jnp.concatenate(
        [lat_in,
         jnp.concatenate([mask_latent] * nc, axis=0),
         jnp.concatenate([masked_latents] * nc, axis=0)], axis=-1)
    emb3 = embeds if mode == "csd" else embeds[1:]           # (u, t) 2-way
    emb = jnp.repeat(emb3, K, axis=0)                        # [nc·K,L,D]

    eps = mods.unet.apply({"params": unet_params},
                          jax.lax.stop_gradient(unet_in), t, emb)
    eps = jax.lax.stop_gradient(eps).reshape(nc, K, LR, LR, 4)
    if mode == "csd":
        pred = cfg_combine_colla(eps[0], eps[1], eps[2], gcfg.w1, gcfg.w2)
    else:
        pred = cfg_combine_sds(eps[0], eps[1], gcfg.colla_guidance_scale)

    grad = score_distillation_grad(pred, noise, sched.sds_weight(t),
                                   mode=mode, standard_sds=True)
    return gcfg.lambda_guidance * inject_gradient(latents_t, grad,
                                                  mask_latent)


def sd_train_step_perpneg(mods: SDModules, gcfg: GuidanceConfig, step_i,
                          rgb, mask, rng, *, text_z, weights,
                          guidance_scale: float, uncond,
                          unet_params=None, vae_params=None,
                          masked_latents=None):
    """Perp-Neg SDS on one modality: azimuth-blended positive prompt plus
    weighted perpendicular components of the auxiliary-direction deltas.

    The reference imports weighted_perpendicular_aggregator
    (sd_utils.py:24) but ships no live caller; this wires the intended
    stable-dreamfusion train-step shape behind gcfg.perpneg.

    Args:
      text_z: [1+K, L, D] (main blended direction, K auxiliaries) from
        adjust_text_embeddings.
      weights: [K] auxiliary Perp-Neg weights.
      uncond: [L, D] unconditional embedding.
    """
    from .perpneg import weighted_perpendicular_aggregator

    S, LR = mods.latent_size, mods.latent_res
    sched = mods.schedule
    unet_params = mods.unet_params if unet_params is None else unet_params
    vae_params = mods.vae_params if vae_params is None else vae_params
    k_noise, k_enc1, k_enc2 = jax.random.split(rng, 3)

    rgb512 = _resize(rgb[None], S) * 2.0 - 1.0
    mask512 = _resize(jnp.abs(mask)[None, ..., None], S)

    vae_apply = lambda img, k: mods.vae.apply(
        {"params": vae_params}, img, k, method=AutoencoderKL.encode)
    init_latents = vae_apply(rgb512, k_enc1)
    if masked_latents is None:
        masked_image = rgb512 * (mask512 < 0.5)
        masked_latents = jax.lax.stop_gradient(
            vae_apply(masked_image, k_enc2))
    mask_latent = _resize(mask512, LR, method="nearest")

    t = sched.annealed_t(step_i, gcfg.t_range, gcfg.anneal_iters)
    noise = jax.random.normal(k_noise, init_latents.shape)
    latents_t = sched.add_noise(init_latents, noise, t)

    n_dir = text_z.shape[0]                  # 1 + K
    k = 1 + n_dir                            # uncond + directions
    lat_in = jnp.concatenate([latents_t] * k, axis=0)
    unet_in = jnp.concatenate(
        [lat_in,
         jnp.concatenate([mask_latent] * k, axis=0),
         jnp.concatenate([masked_latents] * k, axis=0)], axis=-1)
    emb = jnp.concatenate([uncond[None], text_z], axis=0)    # [k, L, D]

    eps = mods.unet.apply({"params": unet_params},
                          jax.lax.stop_gradient(unet_in), t, emb)
    eps = jax.lax.stop_gradient(eps)

    e_unc = eps[:1]                                          # [1,...]
    deltas = eps[1:] - e_unc                                 # [1+K,...]
    agg = weighted_perpendicular_aggregator(deltas, weights, 1)
    pred = e_unc[0] + guidance_scale * agg[0]

    grad = score_distillation_grad(pred[None], noise, sched.sds_weight(t),
                                   mode="sds")
    return gcfg.lambda_guidance * inject_gradient(latents_t, grad,
                                                  mask_latent)


def precompute_masked_latents(mods: SDModules, images, masks, *,
                              vae_params=None, rng=None):
    """Per-view VAE encodings of the masked conditioning image → [N,LR,LR,4].

    For the RGB guidance modality, the composite equals GT outside the
    mask and the masked image zeroes the inside — so the conditioning
    encode `VAE(resize(GT)·(resize(mask)<0.5))` is a per-view constant and
    can be computed ONCE instead of per iteration (saves one full-size VAE
    encode per step: measured 59.9 → 52.0 ms on the production guidance
    step, tools/exp_mlcache.py).

    Divergence, documented: vs the reference's per-iteration encode
    (sd_utils.py:409-433) this (a) uses pure GT in the ≤2 px resize-bleed
    band around the mask boundary where the live composite mixes in render
    pixels, and (b) freezes the VAE posterior sample per view rather than
    redrawing it each step. Toggle with guidance.cache_masked_latents.
    """
    vp = mods.vae_params if vae_params is None else vae_params
    rng = jax.random.PRNGKey(0) if rng is None else rng
    S = mods.latent_size

    @jax.jit
    def enc(img, mask, k, vparams):   # params as ARGUMENT, not constant
        rgb512 = _resize(img[None], S) * 2.0 - 1.0
        m512 = _resize(jnp.abs(mask)[None, ..., None], S)
        return mods.vae.apply({"params": vparams}, rgb512 * (m512 < 0.5), k,
                              method=AutoencoderKL.encode)

    return jnp.concatenate(
        [enc(images[i], masks[i], jax.random.fold_in(rng, i), vp)
         for i in range(images.shape[0])], axis=0)


def guidance_params(mods: SDModules):
    """The SD state to thread through the train step as an ARGUMENT.

    Closing over these in the jitted step would bake ~3.6 GB of UNet/VAE
    weights into the executable as constants (observed); as arguments they
    stay ordinary device buffers.
    """
    p = {"unet": mods.unet_params, "vae": mods.vae_params,
         "embeds_rgb": mods.embeds_rgb,
         "embeds_normal": mods.embeds_normal}
    if mods.embeds_dir is not None:
        p["embeds_dir"] = mods.embeds_dir
    return p


def make_guidance_fn(mods: SDModules, gcfg: GuidanceConfig,
                     n_iters: int = 10000):
    """Build the train-step guidance hook (step.py GuidanceFn contract).

    Dispatch parity with Pretrain_Model.cal_loss (nerf/utils.py:222-319):
    RGB SDS on the composite, normal-map SDS after normal_start_iter, each
    with its own CFG scale; modality losses sum into one scalar. Under
    gcfg.perpneg the RGB modality is azimuth-conditioned: a random orbit
    azimuth is drawn each step (rand_poses, nerf/utils.py:239-245, with
    progressive view-range widening :264-273 when progressive_view), the
    direction-suffixed prompt embeds are blended (adjust_text_embeddings)
    and aggregated Perp-Neg style.

    The returned fn accepts `gparams` (see guidance_params); when None it
    falls back to the module-held params (small/test configs only).
    """
    use_perpneg = gcfg.perpneg and mods.embeds_dir is not None

    def _perpneg_rgb(step_i, combin_rgb, mask, k_rgb, up, vp, e_rgb,
                     e_dir, masked_latents=None):
        from .directional import adjust_text_embeddings
        from .orchestrator import progressive_ranges, rand_poses

        k_az, k_sd = jax.random.split(k_rgb)
        theta_r, phi_r, rad_r = progressive_ranges(step_i, gcfg, n_iters)
        _, _, _, phis, _ = rand_poses(
            k_az, 1, radius_range=rad_r, theta_range=theta_r,
            phi_range=phi_r, angle_overhead=gcfg.angle_overhead,
            angle_front=gcfg.angle_front)
        az = phis * (180.0 / jnp.pi) - gcfg.default_azimuth
        az = jnp.mod(az + 180.0, 360.0) - 180.0       # wrap to [-180, 180)
        text_z, weights = adjust_text_embeddings(
            e_dir, az,
            front_decay_factor=gcfg.front_decay_factor,
            side_decay_factor=gcfg.side_decay_factor,
            negative_w=gcfg.negative_w)
        return sd_train_step_perpneg(
            mods, gcfg, step_i, combin_rgb, mask, k_sd,
            text_z=text_z, weights=weights,
            guidance_scale=gcfg.guidance_scale, uncond=e_rgb[1],
            unet_params=up, vae_params=vp, masked_latents=masked_latents)

    def guidance_fn(step_i, combin_rgb, normal_map, mask, rng,
                    rgbs4=None, masks4=None, gparams=None,
                    masked_latents=None):
        gp = gparams or {}
        up, vp = gp.get("unet"), gp.get("vae")
        e_rgb = gp.get("embeds_rgb", mods.embeds_rgb)
        e_nrm = gp.get("embeds_normal", mods.embeds_normal)
        k_rgb, k_n, k_c = jax.random.split(rng, 3)
        loss = jnp.zeros(())
        # masked_latents caches the RGB modality's conditioning encode
        # only: the composite is GT outside the mask, so its masked image
        # is per-view constant. The normal / collaborative modalities'
        # masked images derive from the live render — never cached.
        if gcfg.is_rgb_guidance and use_perpneg:
            e_dir = gp.get("embeds_dir", mods.embeds_dir)
            loss = loss + _perpneg_rgb(step_i, combin_rgb, mask, k_rgb,
                                       up, vp, e_rgb, e_dir,
                                       masked_latents=masked_latents)
        elif gcfg.is_rgb_guidance:
            # non-crop RGB dispatch: per-modality scale AND CSD triple
            # (nerf/utils.py:289-294, rgb_w1/rgb_w2/rgb_w3)
            loss = loss + sd_train_step(
                mods, gcfg, step_i, combin_rgb, mask, k_rgb,
                embeds=e_rgb, guidance_scale=gcfg.guidance_scale,
                w_triple=(gcfg.rgb_w1, gcfg.rgb_w2, gcfg.rgb_w3),
                unet_params=up, vae_params=vp,
                masked_latents=masked_latents)
        if gcfg.is_colla_guidance and rgbs4 is not None:
            loss = loss + sd_train_step_colla(
                mods, gcfg, step_i, rgbs4, masks4, k_c,
                unet_params=up, vae_params=vp, embeds=e_rgb)
        if gcfg.is_normal_guidance and normal_map is not None:
            # The normal modality's timestep anneal restarts when it
            # switches on: t ∝ √((i − normal_start)/20000), reference
            # sd_utils.py:267 — so the prior begins at MAX noise at
            # i = normal_start_iter, not partway down the RGB schedule.
            n_step = jnp.maximum(
                jnp.asarray(step_i) - gcfg.normal_start_iter, 0)
            # normal dispatch: per-modality triple (nerf/utils.py:305-310,
            # normal_w1/w2/w3); the use_negative gate runs on the GLOBAL
            # iteration (sd_utils.py:175), not the anneal-shifted n_step.
            nloss = sd_train_step(
                mods, gcfg, n_step, normal_map, mask, k_n,
                embeds=e_nrm, guidance_scale=gcfg.normal_guidance_scale,
                w_triple=(gcfg.normal_w1, gcfg.normal_w2, gcfg.normal_w3),
                gate_step=step_i,
                unet_params=up, vae_params=vp)
            loss = loss + jnp.where(step_i > gcfg.normal_start_iter, nloss, 0.0)
        return loss

    return guidance_fn
