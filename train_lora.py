#!/usr/bin/env python
"""CLI: DreamBooth-inpaint LoRA fine-tuning of the SD-inpainting prior.

Reference entry parity (README.md:93-109,
train_dreambooth_inpaint_lora_normal_caption.py):

    python train_lora.py --instance_data_dir data/imgs \\
        --caption_dir data/captions --output_dir ckpt_lora \\
        --max_train_steps 19000 --rank 32 --train_batch_size 4 \\
        [--sd_weights_dir /path/to/sd-inpainting] [--tiny]
"""
from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance_data_dir", required=True)
    ap.add_argument("--caption_dir", default=None)
    ap.add_argument("--instance_mask_dir", default=None)
    ap.add_argument("--output_dir", default="./lora_out")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--train_batch_size", type=int, default=4)
    ap.add_argument("--max_train_steps", type=int, default=2000)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--checkpointing_steps", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sd_weights_dir", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random SD stack (smoke testing)")
    # reference train_dreambooth_inpaint_lora_normal_caption.py parity knobs
    ap.add_argument("--resume_from_checkpoint", default=None,
                    help="'latest' or a checkpoint-N dir (ref :893-917)")
    ap.add_argument("--with_prior_preservation", action="store_true")
    ap.add_argument("--class_data_dir", default=None)
    ap.add_argument("--class_prompt", default=None)
    ap.add_argument("--num_class_images", type=int, default=100)
    ap.add_argument("--prior_loss_weight", type=float, default=1.0)
    ap.add_argument("--sample_steps", type=int, default=50,
                    help="denoise steps for class-image generation")
    ap.add_argument("--train_text_encoder", action="store_true",
                    help="rank-4 text-encoder adapters (ref :656-663)")
    ap.add_argument("--sd_prior_ckpt", default=None,
                    help="tiny-prior msgpack (tools/train_tiny_prior.py) to "
                         "fine-tune ON — the tiny-stack analog of the "
                         "reference personalizing SD1.5-inpaint; consume "
                         "the adapters in stage-2 via guidance.sd_lora_ckpt")
    ap.add_argument("--latent_size", type=int, default=None,
                    help="guidance/render resolution (default 64 tiny, "
                         "512 full; set to the prior's training res)")
    args = ap.parse_args()
    if args.with_prior_preservation and not (args.class_data_dir
                                             and args.class_prompt):
        ap.error("--with_prior_preservation needs --class_data_dir "
                 "and --class_prompt")
    if args.train_text_encoder and args.sd_prior_ckpt:
        # Fail in milliseconds, not after an hours-long run: the prior
        # ckpt bakes the prompt embeds, so stage-2 has no text tower to
        # merge text adapters into (train/loop.py raises the same).
        ap.error("--train_text_encoder is incompatible with "
                 "--sd_prior_ckpt (the prior checkpoint bakes the prompt "
                 "embeds; there is no text tower at guidance time)")

    from run import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from gbnerf_tpu.config import GuidanceConfig
    from gbnerf_tpu.guidance import build_sd_modules
    from gbnerf_tpu.guidance.text import CLIPTextConfig, CLIPTextEncoder, Tokenizer
    from gbnerf_tpu.train.lora_trainer import (DreamBoothInpaintDataset,
                                               train_lora)

    gcfg = GuidanceConfig(sd_weights_dir=args.sd_weights_dir)
    kw = {}
    if args.tiny:
        from gbnerf_tpu.guidance.unet import UNetConfig
        from gbnerf_tpu.guidance.vae import VAEConfig

        kw = dict(unet_config=UNetConfig.tiny(),
                  vae_config=VAEConfig.tiny(),
                  text_config=CLIPTextConfig(vocab_size=49408, width=32,
                                             layers=2, heads=2),
                  latent_size=args.latent_size or 64, dtype=jnp.float32)
    elif args.latent_size:
        kw = dict(latent_size=args.latent_size)
    mods = build_sd_modules(gcfg, jax.random.PRNGKey(args.seed),
                            weights_dir=args.sd_weights_dir, **kw)
    if args.sd_prior_ckpt:
        from gbnerf_tpu.guidance.weights import load_prior_ckpt

        mods = load_prior_ckpt(args.sd_prior_ckpt, mods)
        print(f"[lora] fine-tuning on prior {args.sd_prior_ckpt}")

    # Prompt encoder for caption batches: the SAME text tower (module,
    # params, tokenizer) the guidance stack built — with sd_weights_dir
    # the real CLIP weights are already loaded into it, so text adapters
    # train against the base that guidance's merge will later apply them
    # to. A fresh init here would learn deltas for a different W.
    tok = mods.tokenizer
    text_model, tparams = mods.text_model, mods.text_params
    text_apply = jax.jit(text_model.apply)

    def tokenize(captions):
        return jnp.asarray(tok(captions))

    if args.sd_prior_ckpt and not args.caption_dir:
        # Condition the fine-tune on the PRIOR's baked embedding triple —
        # stage-2 guidance conditions the UNet on exactly these
        # (loop.py sd_prior_ckpt flow), and the prior itself was trained
        # with conditioning sampled uniformly from the triple
        # (tools/train_tiny_prior.py phase B). The draw comes from the
        # trainer's CHECKPOINTED host_rng stream (rng kwarg) so resume
        # replays identically; the fallback rng only serves one-off calls
        # outside the training loop.
        import numpy as np

        emb3 = np.asarray(mods.embeds_rgb)
        _fallback = np.random.default_rng(args.seed + 3)

        def encode_prompt(captions, rng=None):
            idx = (rng or _fallback).integers(0, emb3.shape[0],
                                              len(captions))
            return jnp.asarray(emb3[idx])
    else:
        def encode_prompt(captions, rng=None):
            return text_apply({"params": tparams}, tokenize(captions))

    resolution = (args.resolution if not args.tiny
                  else (args.latent_size or 64))
    dataset = DreamBoothInpaintDataset(
        args.instance_data_dir, caption_dir=args.caption_dir,
        mask_dir=args.instance_mask_dir, resolution=resolution)

    class_dataset = None
    if args.with_prior_preservation:
        from gbnerf_tpu.train.lora_trainer import generate_class_images

        # class images from the repo's own jitted inpaint pipeline
        # (reference generates them with StableDiffusionInpaintPipeline,
        # train_dreambooth...py:510-553). Under --sd_prior_ckpt the baked
        # triple IS (null, uncond, text) in order — use it directly; the
        # index-sampling encode_prompt would scramble the CFG slots.
        if args.sd_prior_ckpt and not args.caption_dir:
            embeds3 = mods.embeds_rgb
        else:
            embeds3 = encode_prompt(["", "", args.class_prompt])
        generate_class_images(mods, embeds3, args.class_data_dir,
                              args.num_class_images,
                              jax.random.PRNGKey(args.seed + 99),
                              num_inference_steps=args.sample_steps,
                              resolution=resolution)
        class_dataset = DreamBoothInpaintDataset(
            args.class_data_dir, resolution=resolution,
            default_caption=args.class_prompt)

    train_lora(mods, dataset, encode_prompt,
               steps=args.max_train_steps, batch_size=args.train_batch_size,
               rank=args.rank, lr=args.learning_rate, seed=args.seed,
               output_dir=args.output_dir,
               checkpointing_steps=args.checkpointing_steps,
               masked_loss=args.instance_mask_dir is not None,
               class_dataset=class_dataset,
               prior_loss_weight=args.prior_loss_weight,
               text_tower=((text_model, tparams)
                           if args.train_text_encoder else None),
               tokenize=tokenize if args.train_text_encoder else None,
               resume_from=args.resume_from_checkpoint)


if __name__ == "__main__":
    main()
