#!/usr/bin/env python
"""Train a tiny self-contained diffusion-inpainting prior on the synthetic
sphere-world domain — the weights-free analog of the reference's LoRA scene
prior (train_dreambooth_inpaint_lora_normal_caption.py): where the reference
personalizes SD1.5-inpaint to the scene, this trains the SAME tiny flax
UNet/VAE stack the guidance path uses (guidance/unet.py tiny config) from
scratch on procedurally generated clean scenes, so stage-2 score
distillation runs against a prior that actually knows the domain.

Output: a msgpack ckpt {unet, vae, embeds_rgb, embeds_normal} consumed by
`guidance.sd_prior_ckpt` (train/loop.py builds the identical tiny stack and
loads this over it).

Phases:
  A. VAE as autoencoder: recon MSE + scaled-latent variance regularizer
     (the SD 0.18215 scaling is calibrated so latents have ~unit variance;
     a fresh VAE must be pushed there or add_noise SNR is mis-calibrated).
  B. UNet ε-prediction on the 9-ch inpainting input (noisy latents, mask,
     masked-image latents), t ~ U[0, 1000), conditioning sampled uniformly
     from the (null, uncond, text) embedding triple so every CFG arm of the
     CSD combine approximates the same conditional score.

Everything device-resident: the domain set uploads once, batches are
in-jit gathers, and steps run in jitted chunks (one dispatch per
`--chunk` steps — the tunneled TPU costs ~27 ms per dispatch).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_synthetic_scene import (look_at, random_hard_params,  # noqa: E402
                                        render_scene, render_scene_hard)


def make_domain_images(n: int, res: int, seed: int,
                       family: str = "spheres"):
    """Random clean sphere-world renders (random albedo/radius/light/sky/
    camera) — a DOMAIN prior, not the target scene: the ablation scene's
    exact geometry/albedo is never shown, only the family it comes from.

    Rendered at the ablation scene's 3:4 aspect then stretched to res² —
    the guidance path resizes every render to a square (stable.py _resize),
    so the prior must be trained under the same distortion.

    Returns (imgs, normal_maps), both [n, res, res, 3] in [0, 1]. The
    normal maps go through the SAME functions the stage-2 guidance path
    uses (train/step.py:396-399: depth → depth2xyz → depth2normal_geo →
    (n+1)/2), so the prior's normal modality sees the pipeline's exact
    visualization convention, un-normalized scale included."""
    import jax.numpy as jnp

    from gbnerf_tpu.core.normals import depth2normal_geo, depth2xyz

    rng = np.random.default_rng(seed)
    H, W = res * 3 // 4, res
    focal = 1.2 * W
    K = jnp.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                    jnp.float32)
    imgs = np.empty((n, res, res, 3), np.float32)
    nrms = np.empty((n, res, res, 3), np.float32)
    yy = (np.arange(res) * H / res).astype(int).clip(0, H - 1)
    for k in range(n):
        th = rng.uniform(-0.6, 0.6)
        el = rng.uniform(-0.25, 0.35)
        pos = np.array([2.5 * np.sin(th), el, 2.5 * np.cos(th)])
        if family == "hard":
            # random textured world + non-convex occluder (round 5): same
            # domain-not-scene principle — every texture/palette/torus pose
            # is a fresh draw, the ablation scene's exact world is never
            # rendered here.
            img, depth, _ = render_scene_hard(H, W, focal, look_at(pos),
                                              hp=random_hard_params(rng))
        else:
            albedo = rng.uniform(0.1, 0.9, 3)
            radius = rng.uniform(0.35, 0.65)
            light = rng.uniform(0.2, 0.9, 3)
            sky = rng.uniform(0.4, 1.0, 3)
            img, depth, _ = render_scene(
                H, W, focal, look_at(pos),
                ((np.zeros(3), radius, albedo),), light=tuple(light),
                sky_tint=tuple(sky))
        imgs[k] = img[yy]                 # vertical stretch H → res
        d = np.nan_to_num(np.asarray(depth, np.float32),
                          posinf=6.0).clip(0.1, 6.0)
        nm = np.asarray(
            (depth2normal_geo(depth2xyz(jnp.asarray(d), K)) + 1.0) / 2.0)
        nrms[k] = nm[yy]
    return imgs, nrms


def make_domain_masks(n: int, res: int, seed: int) -> np.ndarray:
    from gbnerf_tpu.train.lora_trainer import random_mask

    rng = np.random.default_rng(seed + 1)
    return np.stack([random_mask(rng, res, res, ratio=(0.15, 0.6))
                     for _ in range(n)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output ckpt path (.msgpack)")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--n_domain", type=int, default=384)
    ap.add_argument("--steps_vae", type=int, default=1500)
    ap.add_argument("--steps_unet", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=None,
                    help="default scales with --res to a constant pixel "
                         "footprint: 16 up to 256², 4 at 512² (batch 16 at "
                         "512² OOMs the 16 GB v5e HBM in the VAE fwd+bwd)")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--family", choices=("spheres", "hard"),
                    default="spheres",
                    help="procedural domain family (must match the ablation "
                         "scene's --family; see make_synthetic_scene.py)")
    ap.add_argument("--prompt", default="a photo of a sphere")
    args = ap.parse_args()
    if args.batch is None:
        # constant-pixel-footprint default: 16·256² pixels per batch
        args.batch = max(4, int(16 * (256 / max(args.res, 1)) ** 2)) \
            if args.res > 256 else 16
        print(f"[prior] batch={args.batch} (auto for res {args.res})")

    import jax
    import jax.numpy as jnp
    import optax

    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance.stable import build_sd_modules
    from gbnerf_tpu.guidance.text import CLIPTextConfig
    from gbnerf_tpu.guidance.unet import UNetConfig
    from gbnerf_tpu.guidance.vae import AutoencoderKL, VAEConfig
    from gbnerf_tpu.guidance.weights import save_prior_ckpt

    gcfg = GuidanceConfig(prompt=args.prompt, prompt_normal=args.prompt)
    mods = build_sd_modules(
        gcfg, jax.random.PRNGKey(args.seed),
        unet_config=UNetConfig.tiny(), vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig(vocab_size=49408, width=32, layers=2,
                                   heads=2),
        latent_size=args.res, dtype=jnp.float32)
    sched = mods.schedule
    lr_res = args.res // 8

    # cache keyed on every knob that shapes the pool — a stale pool from a
    # different res/seed/n_domain must regenerate, not silently load (a
    # smaller pool would make the in-jit jnp.take CLAMP out-of-range
    # indices with no error)
    fam_tag = "" if args.family == "spheres" else f"_{args.family}"
    cache = (args.out + f".domain_r{args.res}_n{args.n_domain}"
             f"_s{args.seed}{fam_tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        rgb_np, nrm_np = z["rgb"], z["nrm"]
        assert (len(rgb_np) == args.n_domain
                and rgb_np.shape[1] == args.res), \
            f"stale domain cache {cache}: {rgb_np.shape}"
        print(f"[prior] loaded {len(rgb_np)} cached domain images ({cache})",
              flush=True)
    else:
        print(f"[prior] generating {args.n_domain} domain images at "
              f"{args.res}² ...", flush=True)
        rgb_np, nrm_np = make_domain_images(args.n_domain, args.res,
                                            args.seed, family=args.family)
        np.savez(cache, rgb=rgb_np, nrm=nrm_np)
    # Combined two-modality pool [2n]: first n RGB, last n normal maps
    # (the reference's LoRA prior trains jointly on RGB + normal data with
    # per-modality captions, train_dreambooth...py; embeds6 mirrors that).
    imgs = jnp.asarray(np.concatenate([rgb_np, nrm_np]) * 2.0 - 1.0)
    n_pool = 2 * args.n_domain
    masks = jnp.asarray(make_domain_masks(args.n_domain, args.res, args.seed))
    embeds6 = jnp.concatenate([mods.embeds_rgb, mods.embeds_normal])  # [6,L,D]

    # ---- phase A: VAE autoencoder -------------------------------------
    tx_v = optax.adam(args.lr)

    def vae_loss(vp, batch, rng):
        z = mods.vae.apply({"params": vp}, batch, rng,
                           method=AutoencoderKL.encode)
        recon = mods.vae.apply({"params": vp}, z,
                               method=AutoencoderKL.decode)
        var = jnp.mean(z ** 2)
        return (jnp.mean((recon - batch) ** 2)
                + 0.1 * (var - 1.0) ** 2
                + 1e-3 * jnp.mean(jnp.mean(z, axis=(1, 2)) ** 2))

    # The domain pool rides as a jit ARGUMENT (design invariant: a closure
    # capture bakes it into the executable as constants — at 256² the
    # 768-image pool is ~600 MB of baked constants, which overflows the
    # axon tunnel's remote-compile request limit with HTTP 413).
    @jax.jit
    def vae_chunk(vp, opt, rng, imgs):
        def body(_, carry):
            vp, opt, rng = carry
            rng, k_b, k_l = jax.random.split(rng, 3)
            idx = jax.random.randint(k_b, (args.batch,), 0, n_pool)
            batch = jnp.take(imgs, idx, axis=0)
            loss, grads = jax.value_and_grad(vae_loss)(vp, batch, k_l)
            upd, opt = tx_v.update(grads, opt, vp)
            return optax.apply_updates(vp, upd), opt, rng
        vp, opt, rng = jax.lax.fori_loop(
            0, args.chunk, body, (vp, opt, rng))
        # one extra eval for logging (cheap relative to the chunk)
        k_b, k_l = jax.random.split(rng)
        idx = jax.random.randint(k_b, (args.batch,), 0, n_pool)
        return vp, opt, rng, vae_loss(vp, jnp.take(imgs, idx, 0), k_l)

    vp, opt = mods.vae_params, tx_v.init(mods.vae_params)
    rng = jax.random.PRNGKey(args.seed + 10)
    imgs = jax.device_put(imgs)
    t0 = time.time()
    for i in range(0, args.steps_vae, args.chunk):
        vp, opt, rng, l = vae_chunk(vp, opt, rng, imgs)
        print(f"[vae {i + args.chunk}/{args.steps_vae}] loss={float(l):.4f} "
              f"({args.chunk / (time.time() - t0):.0f} it/s)", flush=True)
        t0 = time.time()
    mods = __import__("dataclasses").replace(mods, vae_params=vp)

    # ---- phase B: UNet inpaint-denoiser -------------------------------
    tx_u = optax.adam(args.lr * 0.5)

    def unet_loss(up, vp, embeds6, batch_img, batch_mask, batch_idx, rng):
        k_t, k_n, k_e1, k_e2, k_c = jax.random.split(rng, 5)
        B = batch_img.shape[0]
        enc = lambda x, k: mods.vae.apply({"params": vp}, x, k,
                                          method=AutoencoderKL.encode)
        latents = jax.lax.stop_gradient(enc(batch_img, k_e1))
        masked = batch_img * (batch_mask[..., None] < 0.5)
        mlat = jax.lax.stop_gradient(enc(masked, k_e2))
        mask_l = jax.image.resize(batch_mask[..., None],
                                  (B, lr_res, lr_res, 1), "nearest")
        t = jax.random.randint(k_t, (B,), 0, sched.num_train_timesteps)
        noise = jax.random.normal(k_n, latents.shape)
        noisy = sched.add_noise(latents, noise, t)
        unet_in = jnp.concatenate([noisy, mask_l, mlat], axis=-1)
        # uniform conditioning over the CFG triple of the image's OWN
        # modality (first n_domain pool entries are RGB → embeds_rgb
        # triple, rest are normal maps → embeds_normal triple): each arm
        # of the CSD combine sees the same (approximate) conditional
        # score for its modality.
        is_nrm = (batch_idx >= args.n_domain).astype(jnp.int32)
        ei = 3 * is_nrm + jax.random.randint(k_c, (B,), 0, 3)
        emb = jnp.take(embeds6, ei, axis=0)
        pred = mods.unet.apply({"params": up}, unet_in, t, emb)
        return jnp.mean((pred - noise) ** 2)

    # pool/masks/embeds/frozen-VAE all as jit arguments (see vae_chunk note)
    @jax.jit
    def unet_chunk(up, opt, rng, imgs, masks, embeds6, vp):
        def body(_, carry):
            up, opt, rng = carry
            rng, k_b, k_m, k_l = jax.random.split(rng, 4)
            idx = jax.random.randint(k_b, (args.batch,), 0, n_pool)
            midx = jax.random.randint(k_m, (args.batch,), 0, args.n_domain)
            loss, grads = jax.value_and_grad(unet_loss)(
                up, vp, embeds6, jnp.take(imgs, idx, 0),
                jnp.take(masks, midx, 0), idx, k_l)
            upd, opt = tx_u.update(grads, opt, up)
            return optax.apply_updates(up, upd), opt, rng
        up, opt, rng = jax.lax.fori_loop(0, args.chunk, body, (up, opt, rng))
        k_b, k_m, k_l = jax.random.split(rng, 3)
        idx = jax.random.randint(k_b, (args.batch,), 0, n_pool)
        midx = jax.random.randint(k_m, (args.batch,), 0, args.n_domain)
        return up, opt, rng, unet_loss(up, vp, embeds6,
                                       jnp.take(imgs, idx, 0),
                                       jnp.take(masks, midx, 0), idx, k_l)

    up, opt = mods.unet_params, tx_u.init(mods.unet_params)
    masks = jax.device_put(masks)
    embeds6 = jax.device_put(embeds6)
    t0 = time.time()
    for i in range(0, args.steps_unet, args.chunk):
        up, opt, rng, l = unet_chunk(up, opt, rng, imgs, masks, embeds6, vp)
        print(f"[unet {i + args.chunk}/{args.steps_unet}] "
              f"loss={float(l):.4f} "
              f"({args.chunk / (time.time() - t0):.0f} it/s)", flush=True)
        t0 = time.time()
    mods = __import__("dataclasses").replace(mods, unet_params=up)

    save_prior_ckpt(args.out, mods)
    print(f"[prior] saved {args.out}")


if __name__ == "__main__":
    main()
