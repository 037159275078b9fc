"""UNet2DCondition in flax — Stable Diffusion v1.x (inpainting: 9-ch input).

Fresh implementation of the public SD1.x UNet architecture (the reference
loads it from diffusers as `runwayml/stable-diffusion-inpainting`'s unet,
sd_utils.py:93 — 9-channel conv_in: [noisy latents 4 | mask 1 |
masked-image latents 4], sd_utils.py:481-490).

TPU notes: NHWC everywhere; set dtype=bfloat16 for MXU-speed inference. The
whole forward is one jit region; batch the CFG copies (×2 or ×3) on the
leading axis — on TPU this is a pure batch-dim increase, no replicated
compile.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks import (Downsample2D, ResnetBlock2D, TimestepEmbedding,
                     Transformer2D, Upsample2D, group_norm,
                     timestep_embedding)


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9                 # 4 for txt2img, 9 for inpainting
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8          # heads (SD1.x names this "head dim")
    cross_attention_dim: int = 768
    # down block i has cross-attention unless it's the last
    down_types: Tuple[str, ...] = ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",)

    @staticmethod
    def sd15_inpaint() -> "UNetConfig":
        return UNetConfig(in_channels=9)

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig(in_channels=4)

    @staticmethod
    def tiny(in_channels: int = 9) -> "UNetConfig":
        """Small config for tests (same topology, tiny widths)."""
        return UNetConfig(in_channels=in_channels,
                          block_out_channels=(32, 64, 64, 64),
                          attention_head_dim=2, cross_attention_dim=32)


class UNet2DCondition(nn.Module):
    config: UNetConfig = field(default_factory=UNetConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        """sample: [B, H, W, C_in]; timesteps: [] or [B];
        encoder_hidden_states: [B, L, cross_dim] → [B, H, W, 4]."""
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        t = jnp.broadcast_to(jnp.asarray(timesteps), (sample.shape[0],))
        temb = timestep_embedding(t, ch0)
        temb = TimestepEmbedding(temb_dim, dtype=self.dtype,
                                 name="time_embedding")(temb)

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample)

        # --- down ---
        skips = [h]
        for i, out_ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.down_types[i] == "CrossAttnDownBlock2D"
            # diffusers' SD1.x "attention_head_dim" is actually the HEAD COUNT.
            heads = cfg.attention_head_dim
            dim_head = out_ch // heads
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, dtype=self.dtype,
                                  name=f"down_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(heads, dim_head, dtype=self.dtype,
                                      name=f"down_{i}_attentions_{j}")(
                        h, encoder_hidden_states)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                # Parity fix: diffusers' UNet down blocks use SYMMETRIC
                # padding=1 (downsample_padding=1); only the VAE encoder
                # pads asymmetrically. See blocks.Downsample2D.
                h = Downsample2D(out_ch, dtype=self.dtype, asymmetric=False,
                                 name=f"down_{i}_downsamplers_0")(h)
                skips.append(h)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        heads = cfg.attention_head_dim
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, name="mid_resnets_0")(h, temb)
        h = Transformer2D(heads, mid_ch // heads, dtype=self.dtype,
                          name="mid_attentions_0")(h, encoder_hidden_states)
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, name="mid_resnets_1")(h, temb)

        # --- up ---
        rev = list(reversed(cfg.block_out_channels))
        up_types = list(reversed(cfg.down_types))
        for i, out_ch in enumerate(rev):
            has_attn = up_types[i] == "CrossAttnDownBlock2D"
            dim_head = out_ch // heads
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(out_ch, dtype=self.dtype,
                                  name=f"up_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(heads, dim_head, dtype=self.dtype,
                                      name=f"up_{i}_attentions_{j}")(
                        h, encoder_hidden_states)
            if i < len(rev) - 1:
                h = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_{i}_upsamplers_0")(h)

        h = group_norm(h.shape[-1], name="conv_norm_out", dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return h.astype(jnp.float32)
