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
    args = ap.parse_args()

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
                  latent_size=64, dtype=jnp.float32)
    mods = build_sd_modules(gcfg, jax.random.PRNGKey(args.seed),
                            weights_dir=args.sd_weights_dir, **kw)

    # prompt encoder for caption batches
    tcfg = kw.get("text_config") or CLIPTextConfig()
    tok = Tokenizer(args.sd_weights_dir and f"{args.sd_weights_dir}/tokenizer",
                    max_length=tcfg.max_length, vocab_size=tcfg.vocab_size)
    text_model = CLIPTextEncoder(tcfg, dtype=jnp.float32)
    tparams = jax.jit(text_model.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, tcfg.max_length), jnp.int32)
    )["params"]
    text_apply = jax.jit(text_model.apply)

    def encode_prompt(captions):
        return text_apply({"params": tparams}, jnp.asarray(tok(captions)))

    dataset = DreamBoothInpaintDataset(
        args.instance_data_dir, caption_dir=args.caption_dir,
        mask_dir=args.instance_mask_dir,
        resolution=args.resolution if not args.tiny else 64)
    train_lora(mods, dataset, encode_prompt,
               steps=args.max_train_steps, batch_size=args.train_batch_size,
               rank=args.rank, lr=args.learning_rate, seed=args.seed,
               output_dir=args.output_dir,
               checkpointing_steps=args.checkpointing_steps,
               masked_loss=args.instance_mask_dir is not None)


if __name__ == "__main__":
    main()
